from .checkpoint import (load_checkpoint, load_pretrained_params,  # noqa: F401
                         save_checkpoint, save_mid_checkpoint)
from .optimizer import (learning_rate_for_epoch, make_optimizer,  # noqa: F401
                        merge_params, split_params, trainable_mask)
from .trainer import Trainer  # noqa: F401
