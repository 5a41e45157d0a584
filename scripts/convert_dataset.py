"""CLI for the RGB-D dataset converters (C17), mirroring the reference's
dataset/converter/*_to_pin_format.py entry points
(/root/reference/scripts/convert_*.sh drivers).

Usage:
  python scripts/convert_dataset.py replica   --input_root <seq> --output_root <out>
  python scripts/convert_dataset.py tum       --input_root <seq> --output_root <out>
  python scripts/convert_dataset.py neuralrgbd --input_root <seq> --output_root <out>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", choices=["replica", "tum", "neuralrgbd"])
    ap.add_argument("--input_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--down_sample", action="store_true",
                    help="voxel-downsample the backprojected clouds")
    args = ap.parse_args()

    from pin_slam_tpu.dataset import converters as cv

    fn = {"replica": cv.convert_replica, "tum": cv.convert_tum,
          "neuralrgbd": cv.convert_neuralrgbd}[args.dataset]
    fn(args.input_root, args.output_root, max_frames=args.max_frames)
    print(f"Converted {args.dataset} sequence {args.input_root} "
          f"-> {args.output_root}")


if __name__ == "__main__":
    main()
