#!/bin/bash
# Download Argoverse-HD and convert COCO-format annotations to YOLO txt
# (reference data/scripts/get_argoverse_hd.sh parity).
set -e
d='../argoverse'
mkdir -p "$d" && cd "$d"
curl -L -O https://argoverse-hd.s3.us-east-2.amazonaws.com/Argoverse-HD-Full.zip
unzip -q Argoverse-HD-Full.zip && rm Argoverse-HD-Full.zip
python - <<'PY'
import json
from collections import defaultdict
from pathlib import Path
for split in ("train", "val"):
    ann = json.load(open(f"Argoverse-1.1/annotations/{split}.json"))
    imgs = {im["id"]: im for im in ann["images"]}
    per = defaultdict(list)
    for a in ann["annotations"]:
        im = imgs[a["image_id"]]
        x, y, w, h = a["bbox"]; W, H = im["width"], im["height"]
        per[im["name"]].append(
            f"{a['category_id']} {(x+w/2)/W:.6f} {(y+h/2)/H:.6f} {w/W:.6f} {h/H:.6f}")
    for name, rows in per.items():
        p = Path(f"Argoverse-1.1/labels/{split}/{Path(name).stem}.txt")
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("\n".join(rows))
PY
