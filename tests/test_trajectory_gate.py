"""The 480-frame trajectory gate as a tool (tools/trajectory_gate.py) and
its mechanism (``Trainer(stop_epoch=...)`` / ``train.py --stop_epoch``):
partial runs whose lr schedule is still the FULL one-cycle, so the loc-loss
landmark is comparable to the known-good full run (BASELINE.md process
rule — basin selection is decided by reassociation-level numerics, so any
normalization/dtype lowering change must re-run this gate on chip)."""

import json
import os
import subprocess
import sys

import numpy as np

from tests.test_hooks import make_trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "trajectory_gate.py")


class TestStopEpoch:
    def test_trainer_stops_early_with_full_schedule(self, tmp_path):
        """stop_epoch=2 of total_epochs=5: exactly 2 epochs run, and the lr
        schedule (sized by total_epochs) is untouched."""
        trainer, loader = make_trainer(tmp_path, total_epochs=5, stop_epoch=2)
        trainer.run(loader)
        assert trainer.epoch == 2
        assert trainer.total_epochs == 5          # schedule length unchanged
        assert loader.epochs_seen == [0, 1]

    def test_stop_epoch_none_runs_all(self, tmp_path):
        trainer, loader = make_trainer(tmp_path, total_epochs=2)
        trainer.run(loader)
        assert trainer.epoch == 2


class TestGateTool:
    def test_dry_run_prints_command(self):
        r = subprocess.run(
            [sys.executable, GATE, "--dry_run", "--device_cache",
             "--cache_dtype", "float8_e4m3fn", "--epochs", "20"],
            capture_output=True, text=True, cwd=REPO, timeout=60)
        assert r.returncode == 0, r.stderr
        assert "--stop_epoch 20" in r.stderr
        assert "--cache_dtype float8_e4m3fn" in r.stderr
        assert "hr3d_one_hm_doppler_skel480" in r.stderr

    def test_last_epoch_loc_parses_landmark(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        try:
            from trajectory_gate import last_epoch_loc
        finally:
            sys.path.pop(0)
        log = tmp_path / "x.log.json"
        recs = [dict(mode="train", epoch=e, loc_loss=v)
                for e, v in ((19, 21.0), (20, 18.0), (20, 16.0))]
        recs.append(dict(mode="val", epoch=20, loc_loss=999.0))  # ignored
        log.write_text("\n".join(json.dumps(r) for r in recs))
        ep, loc = last_epoch_loc(str(tmp_path))
        assert ep == 20
        assert np.isclose(loc, 17.0)

    def test_last_epoch_loc_empty(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        try:
            from trajectory_gate import last_epoch_loc
        finally:
            sys.path.pop(0)
        assert last_epoch_loc(str(tmp_path)) == (None, None)
