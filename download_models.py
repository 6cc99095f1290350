#!/usr/bin/env python
"""Drop-in wrapper for the pretrained-model downloader."""
from polyphemus_tpu.cli.download_models import main

if __name__ == "__main__":
    main()
