#!/bin/bash
# Download COCO 2017 (reference data/scripts/get_coco.sh parity).
# Images + labels land in ../coco relative to the repo root.
set -e
d='../'
mkdir -p "$d" && cd "$d"
curl -L -o coco2017labels.zip https://github.com/ultralytics/yolov5/releases/download/v1.0/coco2017labels.zip
unzip -q coco2017labels.zip && rm coco2017labels.zip
cd coco/images
for f in train2017.zip val2017.zip test2017.zip; do
  curl -L -O "http://images.cocodataset.org/zips/$f" && unzip -q "$f" && rm "$f" &
done
wait
