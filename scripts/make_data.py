"""Generate synthetic stand-ins for the reference workloads (the reference
repo ships no data either; comparison/README.md defers to an external repo).

Creates:
  data/pines_synth.tiff                     145x145x200 TIFF stack
  data/salinas_synth.tiff                   512x217x224 TIFF stack
  data/bus.jpg / bike.jpg / umbrellas.jpg   RGB scenes

Usage: python scripts/make_data.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
from PIL import Image

from sph_tpu.utils.testdata import create_hyperspectral_scene


def write_stack(path: str, img: np.ndarray):
    pages = [Image.fromarray(img[:, :, c], mode="F")
             for c in range(img.shape[2])]
    pages[0].save(path, save_all=True, append_images=pages[1:])
    print(f"wrote {path}  {img.shape}")


def write_rgb(path: str, rows: int, cols: int, seed: int):
    img = create_hyperspectral_scene(rows, cols, 3, num_classes=12,
                                     seed=seed, noise=0.05)
    img = (255 * (img - img.min()) / (np.ptp(img) + 1e-9)).astype(np.uint8)
    Image.fromarray(img).save(path, quality=92)
    print(f"wrote {path}  {img.shape}")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data"
    os.makedirs(out, exist_ok=True)
    write_stack(os.path.join(out, "pines_synth.tiff"),
                create_hyperspectral_scene(145, 145, 200, seed=7))
    write_stack(os.path.join(out, "salinas_synth.tiff"),
                create_hyperspectral_scene(512, 217, 224, seed=13))
    for name, seed in (("bus.jpg", 21), ("bike.jpg", 22),
                       ("umbrellas.jpg", 23)):
        write_rgb(os.path.join(out, name), 240, 320, seed)


if __name__ == "__main__":
    main()
