"""Classifier: model shapes, augmentation, training convergence, checkpointing."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fmcw_radar_processing_tpu.models.data import augment_batch, split_dataset
from fmcw_radar_processing_tpu.models.train import TrainConfig, Trainer
from fmcw_radar_processing_tpu.models.vgg import VGG16, SmallCNN
from fmcw_radar_processing_tpu.parallel.mesh import make_mesh


def _toy_dataset(rng, n=64, size=32):
    """Separable binary 'spectrograms': class 1 has a bright band."""
    x = rng.uniform(0, 0.3, (n, size, size, 3)).astype(np.float32)
    y = (np.arange(n) % 2).astype(np.float32)
    x[y == 1, size // 4 : size // 2, :, :] += 0.6
    return x, y


def test_split_dataset_fractions():
    items = [f"img{i}.png" for i in range(100)]
    train, val, test = split_dataset(items)
    assert len(train) == 70 and len(val) == 15 and len(test) == 15
    assert set(train) | set(val) | set(test) == set(items)
    # Deterministic for a fixed seed.
    train2, _, _ = split_dataset(items)
    assert train == train2


def test_vgg16_forward_shape():
    model = VGG16()
    x = jnp.zeros((2, 224, 224, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)["params"]
    logits = model.apply({"params": params}, x, train=False)
    assert logits.shape == (2,)
    # Backbone has the 13 VGG16 conv layers.
    convs = [k for k in params["backbone"] if "conv" in k]
    assert len(convs) == 13


def test_augment_preserves_shape_and_range(rng):
    x = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(1), x)
    assert out.shape == x.shape
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5
    # Augmentation is random: two keys give different outputs.
    out2 = augment_batch(jax.random.PRNGKey(2), x)
    assert float(jnp.abs(out - out2).max()) > 1e-3


def test_training_learns_separable_data(rng):
    x, y = _toy_dataset(rng)
    trainer = Trainer(
        SmallCNN(),
        TrainConfig(learning_rate=1e-3, epochs=5, batch_size=16, augment=False),
        input_shape=x.shape[1:],
    )
    trainer.fit(x, y)
    loss, acc, _ = trainer.evaluate(x, y)
    assert acc >= 0.9, f"failed to fit separable data: acc={acc}"
    cm = trainer.confusion_matrix(x, y)
    assert cm.sum() == len(x)
    assert cm[0, 0] + cm[1, 1] >= 0.9 * len(x)


def test_frozen_backbone_params_do_not_move():
    model = VGG16()
    x = np.zeros((4, 32, 32, 3), np.float32)
    y = np.array([0, 1, 0, 1], np.float32)
    trainer = Trainer(
        model,
        TrainConfig(freeze_backbone=True, epochs=1, batch_size=4, augment=False),
        input_shape=x.shape[1:],
    )
    before = jax.tree_util.tree_map(
        np.asarray, trainer.state.params["backbone"]
    )
    trainer.fit(x, y)
    after = trainer.state.params["backbone"]
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(b, np.asarray(a))
    # Head params must move.
    hb = jax.tree_util.tree_leaves(trainer.state.params["head"])
    assert any(np.abs(np.asarray(p)).sum() > 0 for p in hb)


def test_dp_sharded_train_step(rng):
    mesh = make_mesh()
    x, y = _toy_dataset(rng, n=16, size=16)
    trainer = Trainer(
        SmallCNN(),
        TrainConfig(epochs=1, batch_size=16, augment=False),
        mesh=mesh,
        input_shape=x.shape[1:],
    )
    trainer.fit(x, y)
    assert len(trainer.history) == 1
    assert np.isfinite(trainer.history[0]["loss"])


def test_checkpoint_roundtrip(tmp_path, rng):
    x, y = _toy_dataset(rng, n=8, size=16)
    t1 = Trainer(SmallCNN(), TrainConfig(epochs=1, batch_size=8, augment=False),
                 input_shape=x.shape[1:])
    t1.fit(x, y)
    path = str(tmp_path / "ckpt")
    t1.save(path)
    t2 = Trainer(SmallCNN(), TrainConfig(epochs=1, batch_size=8, augment=False),
                 input_shape=x.shape[1:])
    t2.load(path)
    l1, a1, p1 = t1.evaluate(x, y)
    l2, a2, p2 = t2.evaluate(x, y)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)


def test_full_state_resume(tmp_path, rng):
    """save_state/load_state restores params, opt state, step, keys, history."""
    x, y = _toy_dataset(rng, n=8, size=16)
    cfgt = TrainConfig(epochs=1, batch_size=8, augment=True)
    t1 = Trainer(SmallCNN(), cfgt, input_shape=x.shape[1:])
    t1.fit(x, y, epochs=2)
    path = str(tmp_path / "state")
    t1.save_state(path)

    t2 = Trainer(SmallCNN(), cfgt, input_shape=x.shape[1:])
    t2.load_state(path)
    assert int(t2.state.step) == int(t1.state.step)
    assert t2.history == t1.history
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.opt_state),
                    jax.tree_util.tree_leaves(t2.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # Continued training takes identical next steps (keys restored too).
    t1.fit(x, y, epochs=1)
    t2.fit(x, y, epochs=1)
    _, _, p1 = t1.evaluate(x, y)
    _, _, p2 = t2.evaluate(x, y)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)


def test_classification_report(rng):
    x, y = _toy_dataset(rng, n=32, size=16)
    t = Trainer(SmallCNN(), TrainConfig(epochs=3, batch_size=8, augment=False),
                input_shape=x.shape[1:])
    t.fit(x, y)
    rep = t.classification_report(x, y, class_names=("calf", "human"))
    assert set(rep) == {"calf", "human", "accuracy"}
    for cls in ("calf", "human"):
        row = rep[cls]
        assert set(row) == {"precision", "recall", "f1", "support"}
        assert 0.0 <= row["f1"] <= 1.0 and row["support"] == 16
    cm = t.confusion_matrix(x, y)
    assert rep["accuracy"] == round(float(np.trace(cm) / cm.sum()), 4)


def test_split_dataset_combined_folders(tmp_path):
    """Cell-12 variant: merge <class> and <class>_2 trees, split 70/15/15
    into a flow_from_directory tree with collision-free names."""
    from fmcw_radar_processing_tpu.models.data import (
        split_dataset_combined_folders,
    )

    for folder, n in (("human", 10), ("human_2", 10), ("calf", 20)):
        d = tmp_path / "src" / folder
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"img{i}.png").write_bytes(b"png" + bytes([i]))

    out = tmp_path / "split"
    res = split_dataset_combined_folders(
        {
            "human": [str(tmp_path / "src/human"), str(tmp_path / "src/human_2")],
            "calf": [str(tmp_path / "src/calf")],
        },
        str(out),
    )
    for cname in ("human", "calf"):
        sizes = [len(res[s][cname]) for s in ("train", "val", "test")]
        assert sum(sizes) == 20
        assert sizes[0] == 14 and sizes[1] == 3 and sizes[2] == 3
    # same-named files from the two human folders must not collide
    names = {os.path.basename(p) for s in res.values() for p in s["human"]}
    assert len(names) == 20
    # deterministic re-run
    res2 = split_dataset_combined_folders(
        {
            "human": [str(tmp_path / "src/human"), str(tmp_path / "src/human_2")],
            "calf": [str(tmp_path / "src/calf")],
        },
        str(tmp_path / "split2"),
    )
    assert [os.path.basename(p) for p in res["train"]["human"]] == [
        os.path.basename(p) for p in res2["train"]["human"]
    ]
    assert not (out / "_merged").exists()
