"""Classifier training: optax Adam, frozen-backbone masking, dp sharding.

Mirrors Main_FYP_DCNN_training.ipynb cells 19-29: Adam lr=1e-4, binary
cross-entropy, accuracy metric, 10 epochs, batch 32; checkpoints via orbax
(the .h5 `model2.save` equivalent, cells 21-23); evaluation produces
loss/accuracy plus a confusion matrix (cells 25/29).

The train step is a single jitted function; under a mesh it runs dp-sharded
over the batch axis (gradients all-reduced by XLA from the sharding
annotations). `Trainer` owns the host loop: shuffling, augmentation keys,
metrics, checkpointing.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmcw_radar_processing_tpu.models.data import augment_batch
from fmcw_radar_processing_tpu.parallel.mesh import DATA_AXIS


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4  # notebook cell 19
    epochs: int = 10  # cell 21
    batch_size: int = 32  # cell 17
    freeze_backbone: bool = False  # transfer-learning mode (cell 19)
    augment: bool = True  # train-split augmentation (cell 17)
    seed: int = 42
    # Global-norm gradient clipping (None = off, the notebook's setting).
    # From-scratch training of the plain 16-layer VGG stack — something
    # the reference never does (its backbone is pretrained-frozen) — needs
    # it: unclipped, the first steps blow the activations up and the net
    # collapses to constant logits (measured: loss pinned at ln 2).
    grad_clip_norm: float | None = None


class TrainState(train_state.TrainState):
    pass


def make_optimizer(config: TrainConfig, params=None) -> optax.GradientTransformation:
    opt = optax.adam(config.learning_rate)
    if config.grad_clip_norm:
        opt = optax.chain(
            optax.clip_by_global_norm(config.grad_clip_norm), opt
        )
    if config.freeze_backbone:
        def label_fn(p):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if any(getattr(k, "key", None) == "backbone" for k in path)
                else "trainable",
                p,
            )
        opt = optax.multi_transform(
            {"trainable": opt, "frozen": optax.set_to_zero()}, label_fn
        )
    return opt


def binary_loss_and_metrics(logits: jax.Array, labels: jax.Array):
    loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
    pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)  # threshold, cell 25
    acc = jnp.mean((pred == labels).astype(jnp.float32))
    return loss, acc


def make_train_step(model: nn.Module, mesh: Mesh | None = None):
    """Build the jitted training step.

    step(state, images [B,H,W,C], labels [B], dropout_key) ->
        (state, {'loss', 'accuracy'})

    With a mesh, images/labels shard over the data axis and params
    replicate; XLA inserts the gradient all-reduce.
    """

    def step(state: TrainState, images, labels, key):
        def loss_fn(params):
            logits = model.apply(
                {"params": params}, images, train=True,
                rngs={"dropout": key},
            )
            return binary_loss_and_metrics(logits, labels)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "accuracy": acc}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(repl, NamedSharding(mesh, P(DATA_AXIS, None, None, None)),
                      batch_sh, repl),
        out_shardings=(repl, repl),
    )


def make_eval_step(model: nn.Module):
    @jax.jit
    def step(params, images, labels):
        logits = model.apply({"params": params}, images, train=False)
        loss, acc = binary_loss_and_metrics(logits, labels)
        return loss, acc, jax.nn.sigmoid(logits)

    return step


class Trainer:
    """Host training loop + checkpointing for a binary spectrogram classifier."""

    def __init__(
        self,
        model: nn.Module,
        config: TrainConfig | None = None,
        mesh: Mesh | None = None,
        input_shape: tuple[int, int, int] = (224, 224, 3),
    ):
        self.model = model
        self.config = config or TrainConfig()
        self.mesh = mesh
        root = jax.random.PRNGKey(self.config.seed)
        self._init_key, self._aug_key, self._drop_key = jax.random.split(root, 3)
        dummy = jnp.zeros((1, *input_shape), jnp.float32)
        variables = model.init(self._init_key, dummy, train=False)
        self.params = variables["params"]
        self.tx = make_optimizer(self.config, self.params)
        self.state = TrainState.create(
            apply_fn=model.apply, params=self.params, tx=self.tx
        )
        self._train_step = make_train_step(model, mesh)
        self._eval_step = make_eval_step(model)
        self.history: list[dict[str, float]] = []

    def _batches(self, n: int, rng: np.random.Generator):
        order = rng.permutation(n)
        b = self.config.batch_size
        # steps_per_epoch = n // b (notebook cell 21 `samples // 32`).
        for s in range(max(n // b, 1) if n >= b else 1):
            yield order[s * b : (s + 1) * b]

    def fit(
        self, images: np.ndarray, labels: np.ndarray,
        val: tuple[np.ndarray, np.ndarray] | None = None,
        epochs: int | None = None,
        log_fn: Callable[[str], None] | None = None,
    ):
        epochs = epochs or self.config.epochs
        rng = np.random.default_rng(self.config.seed)
        for epoch in range(epochs):
            losses, accs = [], []
            t0 = time.perf_counter()
            for batch_idx in self._batches(len(images), rng):
                x = jnp.asarray(images[batch_idx])
                y = jnp.asarray(labels[batch_idx])
                if self.config.augment:
                    self._aug_key, k = jax.random.split(self._aug_key)
                    x = augment_batch(k, x)
                self._drop_key, dk = jax.random.split(self._drop_key)
                self.state, metrics = self._train_step(self.state, x, y, dk)
                losses.append(float(metrics["loss"]))
                accs.append(float(metrics["accuracy"]))
            # Step-loop wall time only (the float(metrics) pulls sync every
            # step) — epoch 1 includes jit compile; val passes are outside.
            train_seconds = time.perf_counter() - t0
            entry = {
                "epoch": epoch + 1,
                "loss": float(np.mean(losses)),
                "accuracy": float(np.mean(accs)),
                "steps": len(losses),
                "train_seconds": round(train_seconds, 4),
            }
            if val is not None:
                vloss, vacc, _ = self.evaluate(*val)
                entry.update({"val_loss": vloss, "val_accuracy": vacc})
            self.history.append(entry)
            if log_fn:
                log_fn(str(entry))
        return self.history

    def evaluate(self, images: np.ndarray, labels: np.ndarray):
        """Full-dataset loss/accuracy/probabilities (batch 1 semantics of
        the notebook's test generator collapse to one batched call)."""
        loss, acc, probs = self._eval_step(
            self.state.params, jnp.asarray(images), jnp.asarray(labels)
        )
        return float(loss), float(acc), np.asarray(probs)

    def confusion_matrix(self, images: np.ndarray, labels: np.ndarray):
        """2×2 confusion matrix at threshold 0.5 (notebook cells 25/29)."""
        _, _, probs = self.evaluate(images, labels)
        pred = (probs > 0.5).astype(int)
        y = labels.astype(int)
        cm = np.zeros((2, 2), int)
        for t, p in zip(y, pred):
            cm[t, p] += 1
        return cm

    def classification_report(
        self, images: np.ndarray, labels: np.ndarray,
        class_names: tuple[str, str] = ("0", "1"),
    ) -> dict:
        """Per-class precision/recall/F1/support at threshold 0.5 — the
        sklearn ``classification_report`` the notebook prints (cells 25/29),
        as a dict (keys per class plus 'accuracy')."""
        cm = self.confusion_matrix(images, labels)
        report: dict = {}
        for c, name in enumerate(class_names):
            tp = cm[c, c]
            fp = cm[1 - c, c]
            fn = cm[c, 1 - c]
            prec = tp / (tp + fp) if tp + fp else 0.0
            rec = tp / (tp + fn) if tp + fn else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            report[name] = {
                "precision": round(float(prec), 4),
                "recall": round(float(rec), 4),
                "f1": round(float(f1), 4),
                "support": int(cm[c].sum()),
            }
        report["accuracy"] = round(float(np.trace(cm) / max(cm.sum(), 1)), 4)
        return report

    def set_params(self, params):
        """Replace the model parameters in place (e.g. Keras-imported
        pretrained weights from models/import_keras.py — the notebook's
        `VGG16(weights='imagenet')` setup, cell 19). The optimizer state
        keeps its structure; combined with ``freeze_backbone=True`` this
        reproduces the reference's transfer learning."""
        params = jax.tree_util.tree_map(jnp.asarray, params)
        self.state = self.state.replace(params=params)
        return self

    # ------------- checkpointing (the .h5 save/load equivalent) -------------

    def save(self, path: str):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckpt:
            ckpt.save(path, self.state.params, force=True)

    def load(self, path: str):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckpt:
            restored = ckpt.restore(path, self.state.params)
        self.state = self.state.replace(params=restored)
        return self

    # ------------- full resume (beyond the reference's .h5) -------------
    # The reference checkpoints weights only — no optimizer-state resume
    # (SURVEY §5.4, notebook cells 21-23). Production training needs true
    # resume: params + optimizer state + step + history.

    def save_state(self, path: str):
        import orbax.checkpoint as ocp

        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": jnp.asarray(self.state.step),
            "aug_key": self._aug_key,
            "drop_key": self._drop_key,
        }
        with ocp.StandardCheckpointer() as ckpt:
            ckpt.save(path, payload, force=True)
        with open(os.path.join(path, "history.json"), "w") as f:
            json.dump(self.history, f)

    def load_state(self, path: str):
        import orbax.checkpoint as ocp

        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": jnp.asarray(self.state.step),
            "aug_key": self._aug_key,
            "drop_key": self._drop_key,
        }
        with ocp.StandardCheckpointer() as ckpt:
            restored = ckpt.restore(path, template)
        self.state = self.state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        self._aug_key = restored["aug_key"]
        self._drop_key = restored["drop_key"]
        hist = os.path.join(path, "history.json")
        if os.path.exists(hist):
            with open(hist) as f:
                self.history = json.load(f)
        return self
