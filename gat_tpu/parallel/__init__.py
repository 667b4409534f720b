from .mesh import (make_mesh, data_sharding, replicated,  # noqa: F401
                   shard_batch, pad_to_multiple, DATA, MODEL)
from .sharded import (make_sharded_transcribe,  # noqa: F401
                      make_sharded_transcribe_files,
                      make_sharded_train_step, mlp_tp_shardings,
                      sharded_batch_pitch)
