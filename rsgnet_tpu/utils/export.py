"""Serving export: serialize the inference pipeline as a StableHLO artifact.

The reference has no serving story (SURVEY.md §1: "no serving stack"); a
deployable artifact is the TPU-native equivalent of shipping a
torchscript/ONNX file. ``jax.export`` captures the ENTIRE inference program
(preprocess-normalize -> model forward -> flip-test -> decode -> inverse
affine, i.e. the whole ``make_inference_fn`` pipeline) with the trained
weights baked in as constants, lowered to portable StableHLO bytes that any
matching-platform JAX runtime can deserialize and call without this
package's Python code.

The batch dimension is exported SYMBOLICALLY ("b") so one artifact serves
any batch size — shapes stay static per call, as XLA requires.

Usage:
    blob = export_inference(cfg, model, variables)        # bytes
    fn = load_exported(blob)                              # callable
    preds, maxvals = fn(images, centers, scales)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.core.inference import make_inference_fn


def _maybe_fold(cfg, variables):
    """TEST.FOLD_BN at export time: the fold happens BEFORE the weights are
    baked in as constants, so the artifact carries pre-scaled kernels
    (models/fold_bn.py; measured-neutral live — the knob is honored here
    for config parity, not as a speed claim)."""
    if cfg.TEST.FOLD_BN:
        from rsgnet_tpu.models.fold_bn import fold_bn_variables
        import jax as _jax
        variables = fold_bn_variables(_jax.device_get(variables))
    return variables


def export_inference(cfg: Config, model, variables, platforms=None,
                     normalize_input=False):
    """Serialize the full inference pipeline to StableHLO bytes.

    Args:
      cfg/model: the config + flax module (TEST.* flags are baked in).
      variables: trained {"params", "batch_stats"} — baked into the artifact.
      platforms: lowering platforms, e.g. ("tpu",) or ("cpu", "tpu").
        Defaults to the current backend.
      normalize_input: accept raw uint8 crops (device-side normalization).

    Returns:
      bytes — a self-contained serialized ``jax.export.Exported``.
    """
    infer = make_inference_fn(cfg, model, jit=False,
                              normalize_input=normalize_input)
    variables = _maybe_fold(cfg, variables)

    def serve(images, centers, scales):
        return infer(variables, images, centers, scales)

    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    (b,) = jax_export.symbolic_shape("b")
    img_dtype = jnp.uint8 if normalize_input else jnp.float32
    args = (
        jax.ShapeDtypeStruct((b, h, w, 3), img_dtype),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
    )
    exp = jax_export.export(jax.jit(serve),
                            platforms=platforms)(*args)
    return bytes(exp.serialize())


def export_e2e(cfg: Config, model, variables, src_size, platforms=None):
    """Serialize the END-TO-END pipeline: raw padded uint8 sources + boxes
    (center/scale) -> keypoints, with the separable device warp fused in —
    i.e. detector output straight to coordinates, no host preprocessing.

    src_size: static (H, W) of the padded source images (e.g. (640, 640)).
    The batch dimension is symbolic like ``export_inference``.
    """
    from rsgnet_tpu.core.inference import make_e2e_fn
    e2e = make_e2e_fn(cfg, model, src_size, jit=False)
    variables = _maybe_fold(cfg, variables)

    def serve(images, centers, scales):
        return e2e(variables, images, centers, scales)

    (b,) = jax_export.symbolic_shape("b")
    args = (
        jax.ShapeDtypeStruct((b, src_size[0], src_size[1], 3), jnp.uint8),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
    )
    exp = jax_export.export(jax.jit(serve), platforms=platforms)(*args)
    return bytes(exp.serialize())


def load_exported(blob: bytes):
    """Deserialize an artifact; returns fn(images, centers, scales)."""
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)


def save_exported(path: str, blob: bytes):
    with open(path, "wb") as f:
        f.write(blob)


def read_exported(path: str):
    with open(path, "rb") as f:
        return load_exported(f.read())
