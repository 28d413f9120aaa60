from .attention_pallas import flash_attention, mha_with_flash  # noqa: F401
from .augment import (AugmentParams, eval_augment,  # noqa: F401
                      make_ssl_batch_augment, ssl_augment, supervised_augment)
from .scl_pallas import scl_loss_fused  # noqa: F401
