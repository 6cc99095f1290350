"""Convert a reference torch model directory into a native checkpoint dir.

    python -m polyphemus_tpu.cli.convert TORCH_MODEL_DIR OUT_DIR

After conversion, OUT_DIR loads with polyphemus_tpu.generate.load_model and
the training CLI's --resume machinery (params only; fresh optimizer state).
"""
from __future__ import annotations

import argparse
import os

from flax import serialization

from ..config import save_train_config
from ..convert import convert_torch_model_dir


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Converts a reference (PyTorch) Polyphemus model "
                    "directory to the native checkpoint format.")
    p.add_argument("torch_model_dir", type=str)
    p.add_argument("out_dir", type=str)
    args = p.parse_args(argv)

    variables, cfg = convert_torch_model_dir(args.torch_model_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "checkpoint.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))
    save_train_config(cfg, os.path.join(args.out_dir, "config.json"))
    print(f"Converted {args.torch_model_dir} -> {args.out_dir}")


if __name__ == "__main__":
    main()
