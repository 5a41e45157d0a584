#!/bin/bash
# Convert a neuralrgbd RGB-D sequence into the KITTI-style layout this framework
# reads (ref scripts/convert_neuralrgbd.sh -> dataset/converter/*_to_pin_format.py)

root_path=${1:-./data/neuralrgbd}
sequence_name=${2:-seq}
base_path=${root_path}/${sequence_name}

python3 "$(dirname "$0")/convert_dataset.py" neuralrgbd \
    --input_root "${base_path}" \
    --output_root "${base_path}_pin"
echo "Done."
