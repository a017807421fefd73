#!/bin/bash
# Download PASCAL VOC 07+12 and convert labels to YOLO txt format
# (reference data/scripts/get_voc.sh parity).
set -e
d='../VOC'
mkdir -p "$d" && cd "$d"
for f in VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar VOCtrainval_11-May-2012.tar; do
  curl -L -O "http://host.robots.ox.ac.uk/pascal/VOC/voc${f:12:4}/$f" && tar -xf "$f" && rm "$f"
done
python - <<'PY'
# convert VOC XML annotations to YOLO txt (images/ labels/ split layout)
import xml.etree.ElementTree as ET
from pathlib import Path
names = ['aeroplane','bicycle','bird','boat','bottle','bus','car','cat','chair','cow',
         'diningtable','dog','horse','motorbike','person','pottedplant','sheep','sofa','train','tvmonitor']
root = Path('VOCdevkit')
for year, split, out in [("2007","trainval","train"),("2012","trainval","train"),("2007","test","val")]:
    ids = (root/f"VOC{year}/ImageSets/Main/{split}.txt").read_text().split()
    (Path(f"images/{out}")).mkdir(parents=True, exist_ok=True)
    (Path(f"labels/{out}")).mkdir(parents=True, exist_ok=True)
    for i in ids:
        img = root/f"VOC{year}/JPEGImages/{i}.jpg"
        img.rename(f"images/{out}/{year}_{i}.jpg")
        tree = ET.parse(root/f"VOC{year}/Annotations/{i}.xml")
        sz = tree.find('size'); W, H = float(sz.find('width').text), float(sz.find('height').text)
        rows = []
        for o in tree.iter('object'):
            if o.find('name').text not in names or int(o.find('difficult').text) == 1: continue
            b = o.find('bndbox')
            x1,y1,x2,y2 = (float(b.find(k).text) for k in ('xmin','ymin','xmax','ymax'))
            rows.append(f"{names.index(o.find('name').text)} {(x1+x2)/2/W:.6f} {(y1+y2)/2/H:.6f} {(x2-x1)/W:.6f} {(y2-y1)/H:.6f}")
        Path(f"labels/{out}/{year}_{i}.txt").write_text("\n".join(rows))
PY
