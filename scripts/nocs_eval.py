#!/usr/bin/env python
"""CLI wrapper (reference-style entry point) for cppf_tpu.eval.nocs_eval."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cppf_tpu.eval.nocs_eval import main

if __name__ == "__main__":
    main()
