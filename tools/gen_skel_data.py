"""Generate the synthetic skeleton-mode CRUW-format datasets.

Reproducible CLI for the datasets behind the BASELINE.md training runs
(reference on-disk layout: det3d/datasets/cruw_pose/cruw_pose.py:61-106).
Each frame writes the FULL (D, Z, Y, X) doppler cube (~67 MB f16), so plan
disk accordingly: a 48-seq/10-frame root is ~37 GB.

The recorded runs used:

  # 240-frame set (round 2)
  python tools/gen_skel_data.py /tmp/skel_data2 --num_seqs 24 --seed 2

  # 960-frame concat pair (round 3): root 1 holds the held-out Test split,
  # root 2 is train-only with seq ids offset past root 1's
  python tools/gen_skel_data.py /tmp/skel_data3 --num_seqs 48 --seed 3
  python tools/gen_skel_data.py /tmp/skel_data4 --num_seqs 48 --seed 4 \
      --seq_offset 48 --test_frames 0

  # multi-person set (2 people/frame, pelvis centers >= 1.2 m apart)
  python tools/gen_skel_data.py /tmp/skel_mp2 --num_seqs 12 --seed 5 \
      --persons_per_frame 2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtpose_tpu.data.synthetic import generate_synthetic_dataset  # noqa: E402
from rtpose_tpu.utils import apply_platform_env  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="output directory")
    p.add_argument("--num_seqs", type=int, default=48)
    p.add_argument("--frames_per_seq", type=int, default=10,
                   help="TRAIN frames per sequence")
    p.add_argument("--test_frames", type=int, default=2,
                   help="TEST frames per sequence (0 = no test split)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seq_offset", type=int, default=0,
                   help="first sequence id (avoid collisions when "
                        "concatenating two roots)")
    p.add_argument("--pose_mode", default="skeleton",
                   choices=["skeleton", "gaussian"])
    p.add_argument("--rdr_type", default="dzyx_real")
    p.add_argument("--persons_per_frame", type=int, default=1)
    p.add_argument("--with_lidar", action="store_true",
                   help="also write per-frame LiDAR point clouds")
    p.add_argument("--roi_only", action="store_true",
                   help="write cubes pre-cropped to ROI1 (~6x less disk); "
                        "pair with DIR.CUBES_ARE_ROI=True in the config")
    args = p.parse_args()

    apply_platform_env()
    keys = generate_synthetic_dataset(
        args.root, num_seqs=args.num_seqs,
        frames_per_seq=args.frames_per_seq,
        test_frames_per_seq=args.test_frames,
        rdr_type=args.rdr_type, seed=args.seed,
        pose_mode=args.pose_mode,
        persons_per_frame=args.persons_per_frame,
        with_lidar=args.with_lidar,
        seq_offset=args.seq_offset,
        roi_only=args.roi_only)
    print(f"wrote {args.root}: "
          f"{len(keys['Train'])} train / {len(keys['Test'])} test frames")


if __name__ == "__main__":
    main()
