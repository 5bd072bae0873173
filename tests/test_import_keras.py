"""Keras-h5 → Flax VGG16 weight importer (VERDICT r1 item 2).

Round-trips fabricated Keras-layout weight files (h5 full-model flavor,
h5 weights-only flavor, npz schema) through the importer at tiny scale and
checks (a) every backbone conv + head dense lands in the right Flax slot,
(b) forward passes of the imported model reproduce a NumPy re-implementation
of the Keras graph (proving the HWIO/flatten layout claims, not just the
renames), (c) backbone-only files leave the head at template init, and
(d) strict mode rejects incomplete files. Match: Main_FYP_DCNN_training.ipynb
cell 19 (`VGG16(weights='imagenet', include_top=False)` + Dense head).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmcw_radar_processing_tpu.models.import_keras import (
    import_vgg16_params,
    load_keras_h5,
    load_npz_weights,
    load_pretrained_vgg16,
)
from fmcw_radar_processing_tpu.models.vgg import VGG16

h5py = pytest.importorskip("h5py")

TINY_BLOCKS = ((1, 4), (1, 8))  # block1_conv1, block2_conv1
INPUT = (16, 16, 3)  # two pools -> 4*4*8 = 128 flat features


def _tiny_model():
    return VGG16(blocks=TINY_BLOCKS, dtype=jnp.float32)


def _template(model):
    dummy = jnp.zeros((1, *INPUT), jnp.float32)
    return model.init(jax.random.PRNGKey(0), dummy, train=False)["params"]


def _fabricate_weights(rng, with_head=True):
    """Keras-layout arrays for the tiny topology."""
    w = {
        "block1_conv1/kernel": rng.standard_normal((3, 3, 3, 4)).astype("f4"),
        "block1_conv1/bias": rng.standard_normal(4).astype("f4"),
        "block2_conv1/kernel": rng.standard_normal((3, 3, 4, 8)).astype("f4"),
        "block2_conv1/bias": rng.standard_normal(8).astype("f4"),
    }
    if with_head:
        w.update({
            "dense/kernel": rng.standard_normal((128, 256)).astype("f4"),
            "dense/bias": rng.standard_normal(256).astype("f4"),
            "dense_1/kernel": rng.standard_normal((256, 1)).astype("f4"),
            "dense_1/bias": rng.standard_normal(1).astype("f4"),
        })
    return w


def _write_h5(path, weights, full_model=True):
    """Write Keras's nesting: [model_weights/]<layer>/<layer>/<name>:0."""
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights") if full_model else f
        for key, arr in weights.items():
            layer, name = key.split("/")
            grp = root.require_group(layer).require_group(layer)
            grp.create_dataset(f"{name}:0", data=arr)


def _keras_forward_numpy(weights, x):
    """The Keras graph (conv-relu, maxpool, flatten, dense-relu, dense) in
    NumPy — the independent oracle for layout equivalence."""
    def conv(x, k, b):  # SAME 3x3, NHWC, HWIO
        n, h, wdt, cin = x.shape
        pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = np.zeros((n, h, wdt, k.shape[3]), "f4")
        for dy in range(3):
            for dx in range(3):
                out += np.einsum(
                    "nhwc,co->nhwo",
                    pad[:, dy : dy + h, dx : dx + wdt, :],
                    k[dy, dx],
                )
        return np.maximum(out + b, 0.0)

    def pool(x):
        n, h, w_, c = x.shape
        return x.reshape(n, h // 2, 2, w_ // 2, 2, c).max(axis=(2, 4))

    x = conv(x, weights["block1_conv1/kernel"], weights["block1_conv1/bias"])
    x = pool(x)
    x = conv(x, weights["block2_conv1/kernel"], weights["block2_conv1/bias"])
    x = pool(x)
    x = x.reshape(x.shape[0], -1)  # channels-last flatten
    x = np.maximum(x @ weights["dense/kernel"] + weights["dense/bias"], 0.0)
    return (x @ weights["dense_1/kernel"] + weights["dense_1/bias"])[:, 0]


@pytest.mark.parametrize("full_model", [True, False])
def test_h5_roundtrip_matches_keras_forward(tmp_path, rng, full_model):
    weights = _fabricate_weights(rng)
    path = str(tmp_path / "model.h5")
    _write_h5(path, weights, full_model=full_model)

    model = _tiny_model()
    params, imported = import_vgg16_params(_template(model), load_keras_h5(path))
    assert sorted(imported) == sorted([
        "backbone/block1_conv1/kernel", "backbone/block1_conv1/bias",
        "backbone/block2_conv1/kernel", "backbone/block2_conv1/bias",
        "head/fc/kernel", "head/fc/bias",
        "head/out/kernel", "head/out/bias",
    ])

    x = rng.standard_normal((2, *INPUT)).astype("f4")
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), train=False)
    )
    want = _keras_forward_numpy(weights, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_npz_schema_and_backbone_only(tmp_path, rng):
    weights = _fabricate_weights(rng, with_head=False)
    path = str(tmp_path / "backbone.npz")
    np.savez(path, **weights)

    model = _tiny_model()
    template = _template(model)
    params, imported = import_vgg16_params(template, load_npz_weights(path))
    # All convs imported; head untouched (fresh-init transfer setup).
    assert all(p.startswith("backbone/") for p in imported)
    assert len(imported) == 4
    np.testing.assert_array_equal(
        np.asarray(params["head"]["fc"]["kernel"]),
        np.asarray(template["head"]["fc"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["block1_conv1"]["kernel"]),
        weights["block1_conv1/kernel"],
    )


def test_strict_missing_layer_raises(tmp_path, rng):
    weights = _fabricate_weights(rng)
    del weights["block2_conv1/kernel"], weights["block2_conv1/bias"]
    path = str(tmp_path / "partial.h5")
    _write_h5(path, weights)
    with pytest.raises(KeyError, match="block2_conv1"):
        import_vgg16_params(_template(_tiny_model()), load_keras_h5(path))
    # non-strict: imports what it can
    params, imported = import_vgg16_params(
        _template(_tiny_model()), load_keras_h5(path), strict=False
    )
    assert "backbone/block1_conv1/kernel" in imported


def test_shape_mismatch_raises(tmp_path, rng):
    weights = _fabricate_weights(rng)
    weights["block1_conv1/kernel"] = weights["block1_conv1/kernel"][:, :, :, :2]
    path = str(tmp_path / "bad.h5")
    _write_h5(path, weights)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_vgg16_params(_template(_tiny_model()), load_keras_h5(path))


def test_load_pretrained_into_trainer(tmp_path, rng):
    """Imported params drop into Trainer with freeze_backbone — the full
    transfer-learning setup of notebook cell 19."""
    from fmcw_radar_processing_tpu.models.train import TrainConfig, Trainer

    weights = _fabricate_weights(rng, with_head=False)
    path = str(tmp_path / "imagenet_tiny.npz")
    np.savez(path, **weights)
    model = _tiny_model()
    params, _ = load_pretrained_vgg16(path, model, input_shape=INPUT)

    trainer = Trainer(
        model,
        TrainConfig(freeze_backbone=True, epochs=1, batch_size=4,
                    augment=False),
        input_shape=INPUT,
    )
    trainer.set_params(params)
    x = rng.uniform(0, 1, (4, *INPUT)).astype("f4")
    y = np.array([0, 1, 0, 1], "f4")
    trainer.fit(x, y)
    # Frozen backbone keeps the IMPORTED values, not the template init.
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["backbone"]["block1_conv1"]["kernel"]),
        weights["block1_conv1/kernel"],
    )


def test_ambiguous_dense_raises(rng):
    """ADVICE r2: two Dense layers with identical (in, out) kernel shapes
    must raise, not silently import the lexicographically-last one."""
    w = _fabricate_weights(rng, with_head=True)
    w["dense_2/kernel"] = rng.standard_normal((128, 256)).astype("f4")
    w["dense_2/bias"] = rng.standard_normal(256).astype("f4")
    with pytest.raises(ValueError, match="ambiguous"):
        import_vgg16_params(_template(_tiny_model()), w)
