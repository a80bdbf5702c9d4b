"""Stitch out/visualization/*.png into result.gif (reference analyse/to_gif.py)."""
import glob
import sys

from PIL import Image

if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "out/visualization"
    frames = [Image.open(p) for p in sorted(glob.glob(f"{src}/*.png"))]
    if not frames:
        raise SystemExit(f"no frames under {src}")
    frames[0].save("result.gif", save_all=True, append_images=frames[1:],
                   duration=100, loop=0)
    print(f"result.gif ({len(frames)} frames)")
