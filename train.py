#!/usr/bin/env python
"""Drop-in wrapper: `python train.py ...` == `python -m polyphemus_tpu.cli.train ...`"""
from polyphemus_tpu.cli.train import main

if __name__ == "__main__":
    main()
