#!/usr/bin/env python
"""Paired RGB+IR folder inference. Mirrors the reference detect_twostream.py.
See multispectral_object_detection_tpu/cli/detect_cli.py."""

from multispectral_object_detection_tpu.cli.detect_cli import main

if __name__ == "__main__":
    main()
