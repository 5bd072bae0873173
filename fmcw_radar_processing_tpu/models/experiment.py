"""End-to-end classifier experiment — the reference's full DCNN story.

Reproduces, in one reproducible call, what the reference does across
Main_FYP_DCNN_training.ipynb cells 9-29 plus its serving deployment
(README.md:20): build a labeled micro-Doppler image dataset, split it
70/15/15 (seed 42), train the binary classifier (Adam 1e-4, batch 32,
threshold 0.5), evaluate val/test with loss/accuracy, per-class
precision/recall/F1 and confusion matrices, export the inference artifact,
and round-trip a few test images through the serving path
(`SpectrogramClassifier`) to prove train→serve consistency.

Unlike the notebook — whose field recordings are not in the repo — the
dataset here is generated through the framework's own signal chain
(models/dataset_gen.py), so the whole loop radar IQ → spectrogram PNG →
DCNN → classification is exercised end to end.

The resulting report is written as JSON + markdown so the recorded
held-out accuracy can sit beside the reference's numbers in BASELINE.md
(val/test accuracy 0.9828, notebook cell 25).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Sequence

import numpy as np

from fmcw_radar_processing_tpu.models.data import (
    load_image_folder,
    split_dataset_combined_folders,
)
from fmcw_radar_processing_tpu.models.dataset_gen import (
    DEFAULT_CLASSES,
    ClassSpec,
    generate_micro_doppler_dataset,
)
from fmcw_radar_processing_tpu.models.train import TrainConfig, Trainer


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    images_per_class: int = 192  # reference dataset size (BASELINE.md)
    frames_per_recording: int = 128
    image_size: tuple[int, int] = (224, 224)  # notebook cell 17
    model: str = "small"  # 'small' | 'vgg16' (models/infer._MODELS)
    epochs: int = 10  # cell 21
    batch_size: int = 32  # cell 17
    learning_rate: float = 1e-4  # cell 19
    freeze_backbone: bool = False
    augment: bool = True  # train-split augmentation (cell 17)
    seed: int = 42  # cells 14/16 random_state
    grad_clip_norm: float | None = None  # see TrainConfig.grad_clip_norm
    render_size: tuple[int, int] = (1200, 800)  # 600-dpi export equivalent


def run_classifier_experiment(
    out_dir: str,
    config: ExperimentConfig | None = None,
    classes: Sequence[ClassSpec] = DEFAULT_CLASSES,
    *,
    reuse_dataset: bool = False,
    log_fn=None,
) -> dict:
    """Run the full loop under ``out_dir`` and return the report dict.

    Layout: out_dir/raw/<class>/*.png (chain-generated images),
    out_dir/split/{train,val,test}/<class>/, out_dir/artifact/ (servable),
    out_dir/report.json.
    """
    cfg = config or ExperimentConfig()
    log = log_fn or (lambda s: None)
    raw_dir = os.path.join(out_dir, "raw")
    t0 = time.perf_counter()

    have = reuse_dataset and all(
        os.path.isdir(os.path.join(raw_dir, c.name))
        and len(os.listdir(os.path.join(raw_dir, c.name))) >= cfg.images_per_class
        for c in classes
    )
    if not have:
        log(f"generating {cfg.images_per_class} images/class through the chain…")
        generate_micro_doppler_dataset(
            raw_dir, tuple(classes),
            images_per_class=cfg.images_per_class,
            frames_per_recording=cfg.frames_per_recording,
            seed=cfg.seed,
            image_size=cfg.render_size,
        )
    gen_s = time.perf_counter() - t0

    # 70/15/15 split, seeded — notebook cells 14/16.
    split_root = os.path.join(out_dir, "split")
    split_dataset_combined_folders(
        {c.name: [os.path.join(raw_dir, c.name)] for c in classes},
        split_root, seed=cfg.seed,
    )
    sets = {}
    for split in ("train", "val", "test"):
        sets[split] = load_image_folder(
            os.path.join(split_root, split), size=cfg.image_size
        )
    class_names = tuple(sets["train"][2])
    log(f"split sizes: " + ", ".join(
        f"{s}={len(sets[s][1])}" for s in ("train", "val", "test")))

    from fmcw_radar_processing_tpu.models.vgg import VGG16, SmallCNN

    model = VGG16() if cfg.model == "vgg16" else SmallCNN()
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            epochs=cfg.epochs,
            batch_size=cfg.batch_size,
            freeze_backbone=cfg.freeze_backbone,
            augment=cfg.augment,
            seed=cfg.seed,
            grad_clip_norm=cfg.grad_clip_norm,
        ),
        input_shape=(*cfg.image_size, 3),
    )
    t1 = time.perf_counter()
    trainer.fit(
        sets["train"][0], sets["train"][1],
        val=(sets["val"][0], sets["val"][1]), log_fn=log,
    )
    train_s = time.perf_counter() - t1

    # Device + memory accounting for the record (the notebook's recorded
    # 3-29 s/step on a Colab GPU is the comparison row).
    import jax

    steps_per_epoch = max(1, len(sets["train"][1]) // cfg.batch_size)
    try:
        mem = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        mem = {}
    # Steady-state s/step: epochs AFTER the first (epoch 1 pays the jit
    # compile), step-loop time only (per-epoch val passes excluded) — the
    # honest row against the notebook's recorded 3-29 s/step (cell 21,
    # which Keras likewise reports per train step).
    steady = [h for h in trainer.history[1:]
              if h.get("train_seconds") and h.get("steps")]
    if steady:
        step_seconds = (sum(h["train_seconds"] for h in steady)
                        / sum(h["steps"] for h in steady))
        step_note = "steady-state (excludes epoch-1 compile and val passes)"
    else:  # single-epoch run: compile is unavoidably included
        step_seconds = train_s / max(1, cfg.epochs * steps_per_epoch)
        step_note = "includes jit compile (single epoch) and val passes"
    device_info = {
        "device_kind": jax.local_devices()[0].device_kind,
        "step_seconds": round(step_seconds, 3),
        "step_seconds_note": step_note,
        "steps_per_epoch": steps_per_epoch,
        "peak_bytes_in_use": int(mem.get("peak_bytes_in_use", 0)) or None,
        "bytes_limit": int(mem.get("bytes_limit", 0)) or None,
    }

    report: dict = {
        "device": device_info,
        "dataset": {
            "classes": list(class_names),
            "images_per_class": cfg.images_per_class,
            "frames_per_recording": cfg.frames_per_recording,
            "split": {s: int(len(sets[s][1])) for s in sets},
            "generation_seconds": round(gen_s, 2),
        },
        "model": cfg.model,
        "training": {
            "epochs": cfg.epochs,
            "batch_size": cfg.batch_size,
            "learning_rate": cfg.learning_rate,
            "seconds": round(train_s, 2),
            "history": trainer.history,
        },
    }
    for split in ("val", "test"):
        imgs, labels, _ = sets[split]
        loss, acc, _ = trainer.evaluate(imgs, labels)
        report[split] = {
            "loss": round(loss, 4),
            "accuracy": round(acc, 4),
            "confusion_matrix": trainer.confusion_matrix(imgs, labels).tolist(),
            "report": trainer.classification_report(imgs, labels, class_names),
        }
        log(f"{split}: loss={loss:.4f} accuracy={acc:.4f}")

    # Export + serving round-trip (README.md:20 — classification via API).
    from fmcw_radar_processing_tpu.models.infer import (
        SpectrogramClassifier,
        export_classifier,
    )

    artifact = os.path.join(out_dir, "artifact")
    export_classifier(artifact, cfg.model, trainer.state.params,
                      (*cfg.image_size, 3), class_names)
    clf = SpectrogramClassifier.load(artifact)
    test_root = os.path.join(split_root, "test")
    sample_files = []
    for cname in class_names:
        cdir = os.path.join(test_root, cname)
        sample_files += [
            os.path.join(cdir, f) for f in sorted(os.listdir(cdir))[:2]
        ]
    served = clf.classify_files(sample_files)
    n_match = sum(
        r["label"] == os.path.basename(os.path.dirname(r["file"]))
        for r in served
    )
    report["serving_roundtrip"] = {
        "artifact": artifact,
        "sampled": len(served),
        "correct": int(n_match),
        "predictions": served,
    }

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def report_markdown(report: dict) -> str:
    """Render the report as the markdown published beside BASELINE.md."""
    d = report["dataset"]
    lines = [
        "# Classifier end-to-end report",
        "",
        "Synthetic micro-Doppler dataset generated through the full signal "
        "chain (`models/dataset_gen.py`), split 70/15/15 (seed 42), trained "
        f"with model `{report['model']}` for "
        f"{report['training']['epochs']} epochs "
        f"(Adam {report['training']['learning_rate']}, batch "
        f"{report['training']['batch_size']}) — the notebook's recipe "
        "(Main_FYP_DCNN_training.ipynb cells 14-29).",
        "",
        f"- classes: {', '.join(d['classes'])} "
        f"({d['images_per_class']} images/class, "
        f"{d['frames_per_recording']} frames/recording)",
        f"- split: train {d['split']['train']} / val {d['split']['val']} / "
        f"test {d['split']['test']}",
        f"- dataset generation: {d['generation_seconds']} s "
        f"(chain → spectrogram PNGs)",
        f"- training: {report['training']['seconds']} s",
        "",
    ]
    dev = report.get("device")
    if dev:
        mem = (f", peak HBM {dev['peak_bytes_in_use'] / 2**30:.2f} GiB"
               if dev.get("peak_bytes_in_use") else "")
        lines += [
            f"- device: {dev['device_kind']} — "
            f"{dev['step_seconds']} s/step at batch "
            f"{report['training']['batch_size']} "
            f"({dev['steps_per_epoch']} steps/epoch){mem}; the notebook "
            "recorded 3–29 s/step on its Colab GPU (cell 21)",
            "",
        ]
    if set(d["classes"]) == {"calf", "bees"}:
        # The notebook's SECOND recorded experiment (cells 27-29):
        # bees1-vs-calf, test accuracy 1.00, confusion [[19,0],[0,19]].
        lines += [
            "| Metric | This framework | Reference (notebook cell 29, "
            "bees1-vs-calf) |",
            "|---|---|---|",
            f"| val accuracy | {report['val']['accuracy']} | — |",
            f"| test accuracy | {report['test']['accuracy']} | 1.00 |",
        ]
    else:
        lines += [
            "| Metric | This framework | Reference (notebook cell 25) |",
            "|---|---|---|",
            f"| val accuracy | {report['val']['accuracy']} | 0.9828 |",
            f"| test accuracy | {report['test']['accuracy']} | 0.9828 |",
            f"| val loss | {report['val']['loss']} | 0.2003 |",
            f"| test loss | {report['test']['loss']} | 0.1989 |",
        ]
    lines += [
        "",
        "## Per-class (test)",
        "",
        "| class | precision | recall | f1 | support |",
        "|---|---|---|---|---|",
    ]
    for cname in d["classes"]:
        r = report["test"]["report"][cname]
        lines.append(
            f"| {cname} | {r['precision']} | {r['recall']} | {r['f1']} "
            f"| {r['support']} |"
        )
    cm = report["test"]["confusion_matrix"]
    lines += [
        "",
        f"Test confusion matrix (rows true, cols predicted): {cm}",
        "",
        "## Serving round-trip",
        "",
        f"Artifact exported to `{report['serving_roundtrip']['artifact']}`; "
        f"{report['serving_roundtrip']['correct']}/"
        f"{report['serving_roundtrip']['sampled']} sampled test images "
        "classified correctly through `SpectrogramClassifier` "
        "(the POST /classify path).",
        "",
        "Training history (per epoch):",
        "",
        "| epoch | loss | accuracy | val_loss | val_accuracy |",
        "|---|---|---|---|---|",
    ]
    for h in report["training"]["history"]:
        lines.append(
            f"| {h['epoch']} | {h['loss']:.4f} | {h['accuracy']:.4f} "
            f"| {h.get('val_loss', float('nan')):.4f} "
            f"| {h.get('val_accuracy', float('nan')):.4f} |"
        )
    return "\n".join(lines) + "\n"
