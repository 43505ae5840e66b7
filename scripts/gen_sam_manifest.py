"""Generate the official-SAM checkpoint key->shape manifests.

The official checkpoints (`sam_vit_b_01ec64.pth`, `sam_vit_l_0b3195.pth`,
`sam_vit_h_4b8939.pth`) can't be downloaded in this environment; the manifest
freezes the state-dict CONTRACT (key naming + tensor shapes of the published
SAM architecture at the 1024px input size) so `port_torch_checkpoint` can be
asserted against it. Consumer contract in the reference:
/root/reference/code/lib/model/sam_model.py:46-55 (sam_model_registry +
SamPredictor on the vit_h checkpoint).

Usage: python scripts/gen_sam_manifest.py   (writes tests/data/sam_manifests/)
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, ROOT)

from _torch_sam import make_state_dict  # noqa: E402

from multiply_tpu.models.sam import IMG_SIZE, VIT_CONFIGS  # noqa: E402

OUT = os.path.join(ROOT, "tests", "data", "sam_manifests")


def main():
    os.makedirs(OUT, exist_ok=True)
    for variant in ("vit_b", "vit_l", "vit_h"):
        cfg = dict(VIT_CONFIGS[variant])
        cfg["global_attn"] = tuple(cfg["global_attn"])
        sd = make_state_dict(cfg, IMG_SIZE)
        manifest = {k: list(v.shape) for k, v in sd.items()}
        path = os.path.join(OUT, f"{variant}.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
        n_params = sum(
            int(__import__("numpy").prod(s)) for s in manifest.values()
        )
        print(f"{variant}: {len(manifest)} keys, {n_params/1e6:.1f}M params -> {path}")


if __name__ == "__main__":
    main()
