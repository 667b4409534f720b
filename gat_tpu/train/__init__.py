from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .trainer import Trainer, ReduceLROnPlateau  # noqa: F401
from .manager import TrainingManager  # noqa: F401
from .data import (ArrayDataLoader, stratified_split,  # noqa: F401
                   build_mfcc_train_val, build_melspec_dataloader,
                   build_melspec_train_val)
