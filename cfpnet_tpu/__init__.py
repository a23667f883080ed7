"""cfpnet_tpu — a TPU-native (JAX/XLA/Pallas) depth-completion framework.

Re-implements the full capability surface of CFPNet (denyingmxd/CFPNet,
lightweight-ToF depth completion: RGB + 8x8 zone histograms -> dense metric
depth) as an idiomatic JAX framework:

- ``cfpnet_tpu.config``   : dataclass config + ``@argfile``/yaml CLI parser
  (reference: /root/reference/src/config.py).
- ``cfpnet_tpu.data``     : ToF zone-histogram simulation as vectorized
  transforms, NYU/ZJUL5 loaders, host-prefetch pipeline
  (reference: /root/reference/src/dataloader/*, src/utils/dataloader.py).
- ``cfpnet_tpu.models``   : Flax modules — EfficientNetV2-B3 backbone,
  PointNet histogram encoder, cross-zone fusion transformers, UNet decoder,
  AdaBins-style depth head (reference: /root/reference/src/models/*).
- ``cfpnet_tpu.ops``      : TPU compute ops — align-corners resizes, linear
  attention (Pallas + XLA paths), large-kernel depthwise conv.
- ``cfpnet_tpu.parallel`` : mesh construction, sharded train/eval steps.
- ``cfpnet_tpu.train``    : SILog loss, metric suite, OneCycle/AdamW optim,
  orbax checkpointing, training loop.
"""

__version__ = "0.1.0"
