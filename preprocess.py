#!/usr/bin/env python
"""Drop-in wrapper: `python preprocess.py ...` == `python -m polyphemus_tpu.cli.preprocess ...`"""
from polyphemus_tpu.cli.preprocess import main

if __name__ == "__main__":
    main()
