"""Keras-h5 → Flax weight importer for the VGG16 classifier.

The reference's classifier is *transfer learning*: `VGG16(weights=
'imagenet', include_top=False)` with a frozen backbone, saved as
`vgg16_custom_model_calf_human.h5` (Main_FYP_DCNN_training.ipynb cells
19-23). Reproducing that setup in this framework requires getting Keras
weights — the ImageNet backbone, or the notebook's own trained artifact —
into the Flax parameter tree. This module is that bridge.

Supported containers:
  * Keras HDF5, both flavors — a full ``model.save(...h5)`` file (weights
    under the ``model_weights`` group) and a ``save_weights`` file (layer
    groups at the root). Layer/weight naming follows Keras conventions:
    ``<layer>/<layer>/kernel:0`` etc.
  * A documented NPZ schema (for environments without h5py): flat keys
    ``<layer>/kernel`` and ``<layer>/bias`` — e.g. ``block1_conv1/kernel``
    with shape (3, 3, in, out).

Layout facts that make the mapping a pure rename (verified in the
round-trip test): Keras Conv2D kernels are HWIO — exactly Flax
``nn.Conv``; Dense kernels are (in, out) — exactly Flax ``nn.Dense``; and
Keras ``Flatten`` of a channels-last feature map matches this model's
``x.reshape(B, -1)`` of NHWC, so head weights transfer position-for-
position too (models/vgg.py BinaryHead).

Name map: the 13 backbone convs keep their canonical Keras-applications
names (``block1_conv1`` … ``block5_conv3``) → ``backbone/block{b}_conv{c}``;
the notebook's head Dense layers (created unnamed → ``dense``/``dense_1``,
or any two Dense layers of matching shape) → ``head/fc`` and ``head/out``.
"""

from __future__ import annotations

import re

import numpy as np


def _collect_h5_datasets(group, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten an h5 group into {path: array} (datasets only)."""
    out: dict[str, np.ndarray] = {}
    for key in group:
        item = group[key]
        path = f"{prefix}{key}"
        if hasattr(item, "shape"):  # dataset
            out[path] = np.asarray(item)
        else:  # subgroup
            out.update(_collect_h5_datasets(item, path + "/"))
    return out


def _normalize_keys(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Reduce arbitrary h5/npz paths to ``<layer>/<kernel|bias>`` keys.

    Keras nests weights as ``<layer>/<layer>[/...]/<name>:0`` (the doubled
    layer dir is the layer's variable scope); npz exports use
    ``<layer>/<name>`` directly. Keep the LAST directory-ish component as
    the layer name and strip the ``:0`` suffix.
    """
    out: dict[str, np.ndarray] = {}
    for path, arr in flat.items():
        parts = [p for p in path.split("/") if p]
        if not parts:
            continue
        weight = re.sub(r":\d+$", "", parts[-1])
        layer = parts[-2] if len(parts) >= 2 else ""
        out[f"{layer}/{weight}"] = arr
    return out


def load_keras_h5(path: str) -> dict[str, np.ndarray]:
    """Load a Keras .h5 (full-model or weights-only) into flat
    ``<layer>/<kernel|bias>`` arrays."""
    import h5py

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        flat = _collect_h5_datasets(root)
    return _normalize_keys(flat)


def load_npz_weights(path: str) -> dict[str, np.ndarray]:
    """Load the documented NPZ schema (``<layer>/kernel``, ``<layer>/bias``)."""
    with np.load(path) as z:
        return _normalize_keys({k: z[k] for k in z.files})


_CONV_NAME = re.compile(r"^block(\d+)_conv(\d+)$")


def import_vgg16_params(
    template_params,
    weights: dict[str, np.ndarray],
    *,
    import_head: bool = True,
    strict: bool = True,
):
    """Map Keras-layout weights onto a VGG16 Flax param tree.

    template_params: an initialized ``models.vgg.VGG16`` ``params`` tree
    (provides structure, names, and expected shapes).
    weights: flat dict from :func:`load_keras_h5` / :func:`load_npz_weights`.
    import_head: also fill ``head/fc`` and ``head/out`` from the file's
    Dense layers when present (the notebook's trained artifact); with only
    an ImageNet backbone file the head stays at its template values
    (fresh init — the transfer-learning setup of cell 19).
    strict: raise if any backbone conv is missing or any shape mismatches;
    False returns whatever could be mapped.

    Returns (params, imported_names) where imported_names lists the Flax
    paths that were filled.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, template_params)
    imported: list[str] = []

    def fill(tree_path: tuple[str, ...], arr: np.ndarray):
        node = params
        for k in tree_path[:-1]:
            node = node[k]
        leaf = tree_path[-1]
        want = np.asarray(node[leaf]).shape
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"shape mismatch for {'/'.join(tree_path)}: "
                f"file has {tuple(arr.shape)}, model wants {tuple(want)}"
            )
        node[leaf] = arr.astype(np.float32)
        imported.append("/".join(tree_path))

    # --- backbone convs: canonical names, pure rename ---
    backbone = params["backbone"]
    missing = []
    for lname in backbone:
        if not _CONV_NAME.match(lname):
            continue
        k, b = weights.get(f"{lname}/kernel"), weights.get(f"{lname}/bias")
        if k is None or b is None:
            missing.append(lname)
            continue
        fill(("backbone", lname, "kernel"), k)
        fill(("backbone", lname, "bias"), b)
    if missing and strict:
        raise KeyError(
            f"backbone layers missing from weight file: {missing}; "
            f"file layers: {sorted({p.split('/')[0] for p in weights})}"
        )

    # --- head: the notebook's Dense(256) + Dense(1), if present ---
    if import_head:
        dense_layers = sorted(
            {p.split("/")[0] for p in weights
             if p.endswith("/kernel") and weights[p].ndim == 2}
        )
        head = params["head"]
        for flax_name in ("fc", "out"):
            want = tuple(np.asarray(head[flax_name]["kernel"]).shape)
            # Match on the FULL (in, out) kernel shape — keying by out-dim
            # alone silently picked the lexicographically-last layer when a
            # file held two Dense layers of the same width.
            cands = [n for n in dense_layers
                     if tuple(weights[f"{n}/kernel"].shape) == want]
            if not cands:
                continue  # backbone-only file: head keeps template init
            if len(cands) > 1:
                raise ValueError(
                    f"ambiguous Dense layers for head/{flax_name} "
                    f"(kernel shape {want}): {cands} — rename layers in the "
                    f"weight file to disambiguate"
                )
            src = cands[0]
            fill(("head", flax_name, "kernel"), weights[f"{src}/kernel"])
            fill(("head", flax_name, "bias"), weights[f"{src}/bias"])

    return params, imported


def load_pretrained_vgg16(path: str, model=None, *,
                          input_shape=(224, 224, 3), import_head=True):
    """Init a VGG16 and fill it from a Keras .h5 / .npz file.

    Returns (params, imported_names). The result drops straight into
    ``Trainer`` (with ``freeze_backbone=True`` for the notebook's transfer
    setup) or ``export_classifier``.
    """
    import jax
    import jax.numpy as jnp

    from fmcw_radar_processing_tpu.models.vgg import VGG16

    model = model or VGG16()
    dummy = jnp.zeros((1, *input_shape), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), dummy, train=False)["params"]
    weights = (
        load_npz_weights(path) if path.endswith(".npz") else load_keras_h5(path)
    )
    return import_vgg16_params(template, weights, import_head=import_head)
