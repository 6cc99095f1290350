#!/usr/bin/env python
"""Drop-in wrapper: `python generate.py ...` == `python -m polyphemus_tpu.cli.generate ...`"""
from polyphemus_tpu.cli.generate import main

if __name__ == "__main__":
    main()
