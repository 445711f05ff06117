from tssep_tpu.compat import aliases  # noqa: F401  (registers factory aliases)
from tssep_tpu.compat.torch_ckpt import (  # noqa: F401
    load_torch_checkpoint, torch_checkpoint_to_named, translate_torch_name,
)
