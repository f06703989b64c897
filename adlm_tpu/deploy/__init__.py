"""Deployment: AOT export of the inference program (jax.export)."""

from adlm_tpu.deploy.export import (  # noqa: F401
    export_inference_artifact,
    load_inference_artifact,
)

__all__ = ["export_inference_artifact", "load_inference_artifact"]
