#!/usr/bin/env python
"""Training driver.

Invocation surface matches the reference (/root/reference/train.py,
README.md:44-48):

    python train.py @configs/train_..._combine1.txt
    python train.py configs/debug.yaml
    python train.py --dataset synthetic --epochs 1 ...
"""

import numpy as np

from cfpnet_tpu.config import parse_config
from cfpnet_tpu.train.loop import run_training

from cfpnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()



def set_seeds(seed: int):
    np.random.seed(seed)
    import random

    random.seed(seed)


if __name__ == "__main__":
    config = parse_config().replace(mode="train")
    if config.multihost:
        from cfpnet_tpu.parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed(config)
    set_seeds(config.seed)  # reference train.py:218 (seed 117010053)
    if config.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if config.use_pallas:
        from cfpnet_tpu.ops.dispatch import set_use_pallas

        set_use_pallas(True)
    if getattr(config, "safe_dw_vjp", False):
        from cfpnet_tpu.ops.dispatch import set_safe_dw_vjp

        set_safe_dw_vjp(True)
    if config.selfsup:
        from cfpnet_tpu.train.selfsup import run_selfsup_training

        run_selfsup_training(config)
    else:
        run_training(config)
