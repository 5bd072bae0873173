"""Shrunken end-to-end classifier experiment (VERDICT r1 item 1).

Runs the full loop — synthetic micro-Doppler recordings → signal chain →
spectrogram PNGs → split → train → eval → export → serving round-trip —
at toy scale so CI proves the path; the full-scale run (192 images/class,
the reference's dataset size) is the `classifier-e2e` CLI whose recorded
results live in CLASSIFIER_REPORT.md. Match: Main_FYP_DCNN_training.ipynb
cells 9-29; reference README.md:20.
"""

import os

import numpy as np
import pytest

from fmcw_radar_processing_tpu.models.dataset_gen import (
    CALF,
    HUMAN,
    generate_micro_doppler_dataset,
)
from fmcw_radar_processing_tpu.models.experiment import (
    ExperimentConfig,
    report_markdown,
    run_classifier_experiment,
)


def test_dataset_generation_classes_differ(tmp_path):
    """Chain-generated spectrogram images: right layout, classes separable."""
    res = generate_micro_doppler_dataset(
        str(tmp_path), images_per_class=3, frames_per_recording=48,
        image_size=(160, 120), seed=7,
    )
    assert set(res) == {"calf", "human"}
    from PIL import Image

    arrs = {
        c: [np.asarray(Image.open(p), float) / 255.0 for p in ps]
        for c, ps in res.items()
    }
    for c, imgs in arrs.items():
        for a in imgs:
            assert a.shape == (120, 160, 3)
            assert a.std() > 0.01, f"degenerate {c} image"
    cross = np.mean(
        [np.abs(x - y).mean() for x in arrs["calf"] for y in arrs["human"]]
    )
    within = np.mean(
        [
            np.abs(x - y).mean()
            for c in arrs
            for x in arrs[c]
            for y in arrs[c]
            if x is not y
        ]
    )
    assert cross > within, (cross, within)


def test_classifier_experiment_end_to_end(tmp_path):
    """Toy-scale full loop: must train, report, export, and round-trip."""
    cfg = ExperimentConfig(
        images_per_class=10,
        frames_per_recording=48,
        image_size=(64, 64),
        model="small",
        epochs=30,  # toy scale: 2 steps/epoch, needs ~60 steps to converge
        batch_size=7,  # 14 train images -> 2 steps/epoch
        learning_rate=1e-3,
        augment=False,  # toy scale: augmentation only slows convergence
        render_size=(320, 240),
    )
    report = run_classifier_experiment(str(tmp_path), cfg)

    # Split arithmetic: 10/class -> 7 train, 1-2 val, rest test per class.
    assert report["dataset"]["split"]["train"] == 14
    assert report["dataset"]["classes"] == ["calf", "human"]
    assert len(report["training"]["history"]) == cfg.epochs
    for split in ("val", "test"):
        assert 0.0 <= report[split]["accuracy"] <= 1.0
        cm = np.asarray(report[split]["confusion_matrix"])
        assert cm.sum() == report["dataset"]["split"][split]
    # The classes are visually distinct (a linear probe on the row profile
    # separates them perfectly); the CNN must fit the training set. The
    # full-scale held-out accuracy is recorded in CLASSIFIER_REPORT.md.
    assert report["training"]["history"][-1]["accuracy"] >= 0.8

    # Servable artifact exists and the round-trip ran over 2 images/class.
    art = report["serving_roundtrip"]["artifact"]
    assert os.path.exists(os.path.join(art, "meta.json"))
    # test split has 1 image/class at this scale -> 2 sampled total
    assert report["serving_roundtrip"]["sampled"] == 2
    assert os.path.exists(str(tmp_path / "report.json"))

    md = report_markdown(report)
    assert "val accuracy" in md and "0.9828" in md  # reference column
    assert "Serving round-trip" in md

    # reuse_dataset skips regeneration (same raw dir, fresh split/train).
    report2 = run_classifier_experiment(
        str(tmp_path), cfg, reuse_dataset=True
    )
    assert report2["dataset"]["generation_seconds"] < report["dataset"][
        "generation_seconds"
    ]


def test_bees_class_distinct(tmp_path):
    """The bees signature (VERDICT r2 item 7 — notebook cells 27-29):
    images generate cleanly and are separable from calf, the pairing of
    the notebook's second recorded experiment."""
    from fmcw_radar_processing_tpu.models.dataset_gen import BEES, CLASS_SPECS

    assert set(CLASS_SPECS) == {"human", "calf", "bees"}
    res = generate_micro_doppler_dataset(
        str(tmp_path), classes=(CALF, BEES), images_per_class=3,
        frames_per_recording=48, image_size=(160, 120), seed=11,
    )
    assert set(res) == {"calf", "bees"}
    from PIL import Image

    arrs = {
        c: [np.asarray(Image.open(p), float) / 255.0 for p in ps]
        for c, ps in res.items()
    }
    for c, imgs in arrs.items():
        for a in imgs:
            assert a.std() > 0.01, f"degenerate {c} image"
    cross = np.mean(
        [np.abs(x - y).mean() for x in arrs["calf"] for y in arrs["bees"]]
    )
    within = np.mean(
        [np.abs(x - y).mean()
         for c in arrs for x in arrs[c] for y in arrs[c] if x is not y]
    )
    assert cross > within, (cross, within)
