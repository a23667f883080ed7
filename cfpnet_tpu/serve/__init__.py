"""AOT serving: ``jax.export`` StableHLO artifacts + loader (see export.py)."""

from .export import (  # noqa: F401
    ServingModel,
    export_serving_artifact,
    make_serving_forward,
)
