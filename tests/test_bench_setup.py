"""bench.py setup-path tests: trained-checkpoint detection + fallback."""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench():
    return importlib.import_module("bench")


def test_find_trained_tag_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("SIN3DM_BENCH_TAG", str(tmp_path / "nope"))
    assert _bench()._find_trained_tag() is None


def test_find_trained_tag_partial_artifacts(tmp_path, monkeypatch):
    """An encoding ckpt without a diffusion EMA must NOT count as trained."""
    tag = tmp_path / "ckpt"
    (tag / "encoding").mkdir(parents=True)
    (tag / "diffusion").mkdir()
    for name in ("encoding/ckpt_final.pth", "encoding/feat.npz",
                 "encoding/args.json", "diffusion/args.json"):
        (tag / name).write_bytes(b"x")
    monkeypatch.setenv("SIN3DM_BENCH_TAG", str(tag))
    assert _bench()._find_trained_tag() is None


def test_find_trained_tag_complete(tmp_path, monkeypatch):
    tag = tmp_path / "ckpt"
    (tag / "encoding").mkdir(parents=True)
    (tag / "diffusion").mkdir()
    for name in ("encoding/ckpt_final.pth", "encoding/feat.npz",
                 "encoding/args.json", "diffusion/args.json",
                 "diffusion/ema_0.9999_025000.pt"):
        (tag / name).write_bytes(b"x")
    monkeypatch.setenv("SIN3DM_BENCH_TAG", str(tag))
    assert _bench()._find_trained_tag() == str(tag)
