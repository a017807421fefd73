#!/usr/bin/env python
"""Evaluate a detector (mAP/speed/study tasks). Mirrors the reference
test.py. See multispectral_object_detection_tpu/cli/test_cli.py."""

from multispectral_object_detection_tpu.cli.test_cli import main

if __name__ == "__main__":
    main()
