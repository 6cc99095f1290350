"""Reference-side half of the parity check. Runs INSIDE an environment
that has the reference's dependencies (torch, torch_geometric, muspy) —
normally the venv that `parity_check.py full` provisions.

Imports the reference's own modules (no reimplementation here) and drives
them with a shared z:

    python _ref_generate_driver.py REFERENCE_DIR TORCH_MODEL_DIR Z_NPY OUT_DIR

Writes OUT_DIR/<i>/generated.mid for every row of z, decoded by the
reference's generate.load_model + VAE.decoder + utils.muspy_from_mtp
(/root/reference/generate.py:21-114, utils.py:59-141).
"""
import os
import sys


def main():
    ref_dir, model_dir, z_path, out_dir = sys.argv[1:5]
    ref_dir = os.path.abspath(ref_dir)
    model_dir = os.path.abspath(model_dir)
    z_path = os.path.abspath(z_path)
    out_dir = os.path.abspath(out_dir)
    # generation_config.py reads generation_config.yaml from the CWD at
    # import time (reference quirk, SURVEY.md §2.2.7)
    os.chdir(ref_dir)
    sys.path.insert(0, ref_dir)

    import numpy as np
    import torch

    import generate as ref_generate
    import utils as ref_utils

    device = torch.device("cpu")
    model, _configuration = ref_generate.load_model(model_dir, device)
    z = torch.from_numpy(np.load(z_path)).float().to(device)

    with torch.no_grad():
        mtp, s_tensor = ref_generate.generate_music(model, z)

    for i in range(mtp.shape[0]):
        d = os.path.join(out_dir, str(i))
        os.makedirs(d, exist_ok=True)
        song = ref_utils.muspy_from_mtp(mtp[i].cpu())
        ref_utils.save_midi(song, d, "generated")
    print(f"reference wrote {mtp.shape[0]} sequences to {out_dir}")


if __name__ == "__main__":
    main()
