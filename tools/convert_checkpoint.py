"""Convert reference PyTorch checkpoints to framework-native npz.

Run: python tools/convert_checkpoint.py \
        --vap_model vap_state_dict_jp_20hz_2500msec.pt \
        --cpc_model 60k_epoch4-d0f474de.pt --out vap_jp_20hz.npz

The npz is torch-free to load (`weights.convert.load_pytree_npz`) —
deploy targets never need torch installed.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vap_realtime_tpu.weights.convert import (  # noqa: E402
    load_torch_checkpoint, save_pytree_npz,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_model", required=True)
    ap.add_argument("--cpc_model", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--channel_layers", type=int, default=1)
    ap.add_argument("--cross_layers", type=int, default=3)
    args = ap.parse_args(argv)

    params = load_torch_checkpoint(args.vap_model, args.cpc_model,
                                   args.channel_layers, args.cross_layers)
    save_pytree_npz(args.out, params)
    import numpy as np

    n = sum(np.asarray(x).size for x in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.out} ({n/1e6:.2f} M params)")


if __name__ == "__main__":
    main()
