#!/usr/bin/env python
"""CLI wrapper (reference-style entry point) for cppf_tpu.eval.sunrgbd_inference."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cppf_tpu.eval.sunrgbd_inference import main

if __name__ == "__main__":
    main()
