#!/usr/bin/env python
"""The 480-frame trajectory gate, as one command.

BASELINE.md's process rule: any change to the normalization lowering (or
cache dtype, or any numerics-level change to the train step) must re-run a
480-frame skeleton training and check that the regression loss is on the
KNOWN-GOOD trajectory — basin selection here is decided by
reassociation-level numerics (the round-3 GroupNorm finding), so isolated
step-equality tests cannot certify such changes.

Landmarks (real-chip runs recorded in BASELINE.md):

* good basin:  loc ~17 at epoch 20, ~14 by epoch 45, anneals to ~2
* bad basin:   loc plateaus at ~47-58 (the predict-the-mean level)

This tool runs ``tools/train.py configs/cruw_pose/hr3d_one_hm_doppler_
skel480.py`` with ``--stop_epoch`` (the lr schedule stays the full
400-epoch one-cycle — a shortened schedule would change the trajectory),
reads the run's ``*.log.json``, and PASSES iff the mean loc loss over the
last observed epoch is below ``--threshold`` (default 25: midway between
the good landmark and the bad plateau, with slack for epoch-to-epoch
noise).

Usage (on the TPU chip, ~6 min at 20 epochs):

    python tools/trajectory_gate.py --device_cache
    python tools/trajectory_gate.py --device_cache \
        --cache_dtype float8_e4m3fn          # the round-4 fp8 gate run
    python tools/trajectory_gate.py --dry_run    # print the command only

Exit code 0 = PASS, 1 = FAIL, 2 = could not run/parse.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG = os.path.join(
    REPO, "configs", "cruw_pose", "hr3d_one_hm_doppler_skel480.py")


def parse_args():
    p = argparse.ArgumentParser(description="480-frame trajectory gate")
    p.add_argument("--config", default=DEFAULT_CONFIG)
    p.add_argument("--epochs", type=int, default=20,
                   help="stop epoch (landmark: good loc ~17 at 20)")
    p.add_argument("--threshold", type=float, default=25.0,
                   help="PASS iff last-epoch mean loc loss < this")
    p.add_argument("--work_dir", default=None,
                   help="run dir (default: a fresh temp dir)")
    p.add_argument("--device_cache", action="store_true")
    p.add_argument("--cache_dtype", default=None,
                   help="e.g. bfloat16 / float8_e4m3fn — the dtype under "
                        "test when gating a cache-compression change")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dry_run", action="store_true")
    return p.parse_args()


def last_epoch_loc(work_dir: str):
    """(epoch, mean loc_loss over its logged intervals) of the last epoch."""
    logs = sorted(glob.glob(os.path.join(work_dir, "*.log.json")))
    if not logs:
        return None, None
    by_epoch = {}
    for path in logs:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("mode") == "train" and "loc_loss" in rec:
                    by_epoch.setdefault(int(rec["epoch"]), []).append(
                        float(rec["loc_loss"]))
    if not by_epoch:
        return None, None
    ep = max(by_epoch)
    return ep, sum(by_epoch[ep]) / len(by_epoch[ep])


def main():
    args = parse_args()
    work_dir = args.work_dir or tempfile.mkdtemp(prefix="trajectory_gate_")
    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py"),
           args.config, "--work_dir", work_dir,
           "--stop_epoch", str(args.epochs), "--seed", str(args.seed)]
    if args.device_cache:
        cmd.append("--device_cache")
    if args.cache_dtype:
        cmd += ["--cache_dtype", args.cache_dtype]
    print(f"# trajectory gate: {' '.join(cmd)}", file=sys.stderr)
    if args.dry_run:
        return 0
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print(f"TRAJECTORY GATE: ERROR (train exited {r.returncode}, "
              f"logs in {work_dir})")
        return 2
    ep, loc = last_epoch_loc(work_dir)
    if loc is None:
        print(f"TRAJECTORY GATE: ERROR (no loc_loss records in {work_dir})")
        return 2
    verdict = "PASS" if loc < args.threshold else "FAIL"
    print(f"TRAJECTORY GATE: {verdict} — epoch {ep} mean loc {loc:.2f} "
          f"(threshold {args.threshold}; good basin ~17 at epoch 20, "
          f"bad plateau ~47-58) [{work_dir}]")
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
