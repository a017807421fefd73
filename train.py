#!/usr/bin/env python
"""Train a (two-stream) detector. CLI-compatible entry point mirroring the
reference train.py. See multispectral_object_detection_tpu/cli/train_cli.py."""

from multispectral_object_detection_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
