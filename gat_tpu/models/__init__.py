from .mlp import MLP, mlp_dims  # noqa: F401
from .cnn import CNN, adaptive_avg_pool_2d  # noqa: F401
from .baselines import SoftmaxRegression  # noqa: F401
