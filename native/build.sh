#!/usr/bin/env bash
# Build the native host-image runtime -> native/libmsod_image.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libmsod_image.so image_ops.cpp -ljpeg
echo "built $(pwd)/libmsod_image.so"
