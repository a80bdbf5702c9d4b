"""Offline analysis scripts (reference analyse/*.py equivalents)."""

import numpy as np
import pandas as pd

from particle_simulation_tpu.analyse.common import lineplot, load_runs
from particle_simulation_tpu.observability import CSV_HEADER


def test_load_and_plot(tmp_path):
    csv = tmp_path / "sweep.csv"
    rows = [CSV_HEADER]
    for sched in ("Naive", "Dynamic"):
        for t in (10, 20, 40):
            rows.append(f"{sched},1000,2,{t},256,100,0,1234,{t * 1.5}")
    csv.write_text("\n".join(rows) + "\n")
    df = load_runs(str(csv))
    assert len(df) == 6
    assert set(df["func"]) == {"Naive", "Dynamic"}
    out = tmp_path / "plot.png"
    lineplot(df, "mobility steps", "time", "func", str(out), logy=True)
    assert out.exists() and out.stat().st_size > 1000


def test_cc_plot(tmp_path):
    from particle_simulation_tpu.analyse.plot_cc import CC_HEADER, plot

    csv = tmp_path / "pic_cc.csv"
    rows = [CC_HEADER]
    for sched in ("Naive", "Dynamic"):
        for cc in (0.1, 1.0, 10.0):
            rows.append(f"{sched},1000,2,20,256,100,{cc},1234,{cc * 7.5}")
    csv.write_text("\n".join(rows) + "\n")
    out = tmp_path / "cc.png"
    plot(str(csv), str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_plot_all(tmp_path):
    from particle_simulation_tpu.analyse.plot_all import load_all, plot

    data = tmp_path / "out" / "data"
    data.mkdir(parents=True)
    for name in ("a.csv", "b.csv"):
        rows = [CSV_HEADER]
        for t in (10, 20):
            rows.append(f"Dynamic,1000,2,{t},256,100,0,55,{t * 2.5}")
        (data / name).write_text("\n".join(rows) + "\n")
    df = load_all(data_dir=str(data))
    assert set(df["source"]) == {"a.csv", "b.csv"}
    out = tmp_path / "overview.png"
    plot(df, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_gif_assembly(tmp_path):
    from PIL import Image

    src = tmp_path / "viz"
    src.mkdir()
    for i in range(3):
        Image.fromarray(
            (np.random.rand(16, 16, 3) * 255).astype(np.uint8)
        ).save(src / f"test_{i:04d}.png")
    import glob
    frames = [Image.open(p) for p in sorted(glob.glob(f"{src}/*.png"))]
    gif = tmp_path / "result.gif"
    frames[0].save(str(gif), save_all=True, append_images=frames[1:],
                   duration=100, loop=0)
    assert gif.exists()
    assert Image.open(str(gif)).n_frames == 3
