"""Observability: metric logger, profiler helpers, CLI entry imports."""

import json
import os

import numpy as np

from protoclip_tpu.obs import MetricLogger, timed


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path / "run"), use_tensorboard=False)
    logger.scalar("Loss/train", 0.5, 1)
    logger.scalar("Accuracy/val", 0.9, 1)
    logger.close()
    lines = open(tmp_path / "run" / "metrics.jsonl").read().strip().split("\n")
    rows = [json.loads(l) for l in lines]
    assert rows[0]["tag"] == "Loss/train" and rows[0]["value"] == 0.5
    assert rows[1]["step"] == 1


def test_metric_logger_tensorboard(tmp_path):
    # torch (-> tensorboard SummaryWriter) is installed in the test env, so
    # the tfevents file must actually be written — the jsonl fallback alone
    # would hide a broken SummaryWriter integration
    import importlib.util

    logger = MetricLogger(str(tmp_path / "tb"))
    logger.scalar("x", 1.0, 0)
    logger.close()
    files = os.listdir(tmp_path / "tb")
    assert "metrics.jsonl" in files
    has_tb = (
        importlib.util.find_spec("torch") is not None
        or importlib.util.find_spec("tensorboard") is not None
    )
    if has_tb:
        assert any("tfevents" in f for f in files), files


def test_timed():
    results = {}
    with timed("block", results):
        _ = np.ones(10).sum()
    assert results["block"] >= 0


def test_cli_modules_import():
    import protoclip_tpu.cli.main
    import protoclip_tpu.cli.ood
    import protoclip_tpu.cli.tsne

    assert callable(protoclip_tpu.cli.main.main)
    assert callable(protoclip_tpu.cli.ood.main)
    assert callable(protoclip_tpu.cli.tsne.main)
