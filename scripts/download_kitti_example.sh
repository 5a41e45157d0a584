#!/usr/bin/env bash
# Download the 100-frame KITTI example used by the demo profiles
# (counterpart of the reference's scripts/download_kitti_example.sh).
# NOTE: this build environment has no network egress — run this on a
# connected machine, then point config/lidar_slam/run_demo.yaml's pc_path at
# the extracted folder.
set -euo pipefail

cd "$(dirname "$0")/.."
mkdir -p data
cd data

echo "Downloading the KITTI example (first 100 frames of seq 00)..."
wget -c https://www.ipb.uni-bonn.de/html/projects/pin_slam/kitti_example.tar.gz
tar -xvf kitti_example.tar.gz
rm kitti_example.tar.gz
echo "Done: data/kitti_example"
