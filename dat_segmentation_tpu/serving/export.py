"""AOT model export for deployment (jax.export / StableHLO).

The reference has no serving story beyond `tools/test.py` (torch eager);
a production TPU framework needs one: a self-contained, ahead-of-time
compiled artifact that a serving host can load WITHOUT the training
codebase, flax, or the model definition — only jax. ``jax.export``
lowers the jitted forward to versioned StableHLO with the weights baked
in as constants, giving:

* no tracing/weight-loading at serving startup (just deserialize+compile);
* a stable, inspectable compilation contract (StableHLO serialization
  compatibility windows instead of pickled python);
* multi-platform artifacts (one export can carry cpu+tpu lowerings).

Design notes:
* The exported entry is the stride-4-logits forward (``upsample=False``)
  — identical to what ``SegInferencer`` jits (eval/inference.py:110-122):
  the final bilinear upsample is linear, so resizing on the serving host
  after slicing off padding is exact and cuts the output transfer ~32x.
* Exports default to ``kernel_impl='xla'``: Pallas TPU kernels lower to
  Mosaic custom calls whose serialized artifacts carry much narrower
  compatibility guarantees than pure StableHLO. The XLA composite path
  is numerically identical (tests/test_pallas_kernel.py), just slower on
  TPU; pass ``portable=False`` to keep the config's kernel choice.
* Static shapes by construction (TPU/XLA rule): one entry per
  (batch, H, W); export several buckets for varied serving traffic.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.schema import ModelConfig

_FORMAT_VERSION = 1


def _portable_cfg(model_cfg: ModelConfig, portable: bool) -> ModelConfig:
    if not portable:
        return model_cfg
    return dataclasses.replace(
        model_cfg,
        backbone=dataclasses.replace(model_cfg.backbone, kernel_impl="xla"),
    )


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
        else v,
        tree,
    )


def export_segmentor(
    model_cfg: ModelConfig,
    variables: Dict[str, Any],
    *,
    batch: int = 1,
    input_size: Tuple[int, int] = (512, 512),
    compute_dtype=jnp.bfloat16,
    platforms: Optional[Sequence[str]] = None,
    portable: bool = True,
):
    """Export the segmentor forward: (B, H, W, 3) normalized float32 ->
    (B, H/4, W/4, num_classes) float32 stride-4 logits.

    Returns a ``jax.export.Exported`` (serialize with ``.serialize()``).
    """
    from jax import export as jexport

    from ..models import build_model

    model = build_model(_portable_cfg(model_cfg, portable))
    variables = _cast_floats(variables, compute_dtype)

    def fwd(image):
        out = model.apply(
            variables, image.astype(compute_dtype), train=False,
            upsample=False,
        )
        return out.astype(jnp.float32)

    h, w = input_size
    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    return jexport.export(jax.jit(fwd), **kwargs)(spec)


def export_classifier(
    model_cfg: ModelConfig,
    variables: Dict[str, Any],
    *,
    batch: int = 1,
    input_size: Tuple[int, int] = (224, 224),
    compute_dtype=jnp.bfloat16,
    platforms: Optional[Sequence[str]] = None,
    portable: bool = True,
):
    """Export the classifier forward: (B, H, W, 3) float32 -> (B, num_classes)
    float32 logits."""
    from jax import export as jexport

    from ..models import build_model

    model = build_model(_portable_cfg(model_cfg, portable))
    variables = _cast_floats(variables, compute_dtype)

    def fwd(image):
        out = model.apply(variables, image.astype(compute_dtype), train=False)
        return out.astype(jnp.float32)

    h, w = input_size
    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    return jexport.export(jax.jit(fwd), **kwargs)(spec)


def save_artifact(
    directory,
    entries: Dict[str, Any],
    *,
    task: str = "segmentor",
    model_cfg: Optional[ModelConfig] = None,
    num_classes: Optional[int] = None,
    classes: Optional[Sequence[str]] = None,
    palette: Optional[Sequence[Sequence[int]]] = None,
    extra_meta: Optional[dict] = None,
) -> Path:
    """Write ``{name: Exported}`` plus a meta.json manifest.

    Layout: ``<dir>/<name>.shlo`` (serialized Exported) + ``meta.json``
    recording the io contract (shapes/dtypes per entry, normalization
    constants, class names/palette, output stride) so a serving host
    needs nothing but this directory.
    """
    from ..data.ade20k import IMG_NORM_MEAN, IMG_NORM_STD

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    manifest_entries = {}
    for name, exp in entries.items():
        data = exp.serialize()
        (directory / f"{name}.shlo").write_bytes(data)
        manifest_entries[name] = {
            "file": f"{name}.shlo",
            "input_shape": list(exp.in_avals[0].shape),
            "input_dtype": str(exp.in_avals[0].dtype),
            "output_shape": list(exp.out_avals[0].shape),
            "output_dtype": str(exp.out_avals[0].dtype),
            "platforms": list(exp.platforms),
            "bytes": len(data),
        }
    meta = {
        "format_version": _FORMAT_VERSION,
        "task": task,
        "jax_version": jax.__version__,
        "entries": manifest_entries,
        "output_stride": 4 if task == "segmentor" else None,
        "norm_mean": [float(v) for v in IMG_NORM_MEAN],
        "norm_std": [float(v) for v in IMG_NORM_STD],
    }
    if num_classes is not None:
        meta["num_classes"] = int(num_classes)
    if classes is not None:
        meta["classes"] = list(classes)
    if palette is not None:
        meta["palette"] = [list(p) for p in palette]
    if model_cfg is not None:
        meta["model_config"] = dataclasses.asdict(model_cfg)
    if extra_meta:
        meta.update(extra_meta)
    (directory / "meta.json").write_text(json.dumps(meta, default=str))
    return directory


class ServingModel:
    """Load an exported artifact dir and serve predictions.

    Needs only jax + numpy (+ cv2 optionally, for faster host resize) —
    no flax, no model code. Entries compile lazily on first call and are
    cached per entry name.
    """

    def __init__(self, directory):
        self.directory = Path(directory)
        self.meta = json.loads((self.directory / "meta.json").read_text())
        if self.meta.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} is newer "
                f"than this loader ({_FORMAT_VERSION})"
            )
        self._fns: Dict[str, Any] = {}

    @classmethod
    def load(cls, directory) -> "ServingModel":
        return cls(directory)

    @property
    def entries(self) -> Dict[str, dict]:
        return self.meta["entries"]

    def _fn(self, name: str):
        if name not in self._fns:
            from jax import export as jexport

            info = self.meta["entries"][name]
            exp = jexport.deserialize(
                (self.directory / info["file"]).read_bytes()
            )
            self._fns[name] = jax.jit(exp.call)
        return self._fns[name]

    def __call__(self, name: str, image: np.ndarray) -> np.ndarray:
        """Raw entry call: normalized float32 input at the entry's exact
        shape -> float32 output on the host."""
        return np.asarray(jax.device_get(self._fn(name)(jnp.asarray(image))))

    # -- convenience serving paths ------------------------------------------

    def _pick_entry(self, h: int, w: int) -> str:
        """Smallest entry that fits (h, w); error if none does."""
        best = None
        for name, info in self.meta["entries"].items():
            _, eh, ew, _ = info["input_shape"]
            if eh >= h and ew >= w:
                area = eh * ew
                if best is None or area < best[0]:
                    best = (area, name)
        if best is None:
            raise ValueError(
                f"no exported entry fits input {h}x{w}; have "
                f"{[tuple(i['input_shape'][1:3]) for i in self.meta['entries'].values()]}"
            )
        return best[1]

    def predict_semseg(
        self, raw_img: np.ndarray, entry: Optional[str] = None
    ) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H, W) int32 class map.

        Normalizes, zero-pads to the entry shape (smallest fitting entry
        by default), forwards, slices the stride-4 logits back to the
        image region and upsamples on the host (exact: the upsample is
        linear, mirroring eval/inference.py whole mode).
        """
        assert self.meta["task"] == "segmentor"
        h, w = raw_img.shape[:2]
        entry = entry or self._pick_entry(h, w)
        info = self.meta["entries"][entry]
        b, eh, ew, _ = info["input_shape"]
        mean = np.asarray(self.meta["norm_mean"], np.float32)
        std = np.asarray(self.meta["norm_std"], np.float32)
        norm = (raw_img.astype(np.float32) - mean) / std
        padded = np.zeros((b, eh, ew, 3), np.float32)
        padded[0, :h, :w] = norm
        small = self(entry, padded)[0]  # (eh/4, ew/4, C)
        logits = _resize_bilinear(small, (eh, ew))[:h, :w]
        return np.argmax(logits, axis=-1).astype(np.int32)

    def predict_cls(self, image: np.ndarray, entry: Optional[str] = None):
        """Normalized (H, W, 3) or (B, H, W, 3) float32 -> (B,) argmax +
        (B, num_classes) logits."""
        assert self.meta["task"] == "classifier"
        if image.ndim == 3:
            image = image[None]
        entry = entry or next(iter(self.meta["entries"]))
        logits = self(entry, image.astype(np.float32))
        return np.argmax(logits, axis=-1).astype(np.int32), logits


def _resize_bilinear(x: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """(h, w, C) float32 bilinear resize, cv2 when present (SIMD) else a
    pure-numpy separable implementation (half-pixel centers, matching
    cv2.INTER_LINEAR / align_corners=False)."""
    try:
        import cv2  # noqa: F401 — availability probe

        from ..eval.inference import _resize_probs

        return _resize_probs(x, out_hw)
    except ImportError:
        pass
    h, w, _ = x.shape
    oh, ow = out_hw

    def axis_weights(n_in, n_out):
        pos = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        pos = np.clip(pos, 0, n_in - 1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (pos - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, oh)
    xlo, xhi, xf = axis_weights(w, ow)
    rows = x[ylo] * (1 - yf)[:, None, None] + x[yhi] * yf[:, None, None]
    return (
        rows[:, xlo] * (1 - xf)[None, :, None]
        + rows[:, xhi] * xf[None, :, None]
    ).astype(np.float32)
