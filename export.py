#!/usr/bin/env python
"""Export a trained model (StableHLO + manifest, optional SavedModel/
TFLite). Mirrors the reference models/export.py at the repo root. See
multispectral_object_detection_tpu/cli/export_cli.py."""

from multispectral_object_detection_tpu.cli.export_cli import main

if __name__ == "__main__":
    main()
