"""Per-frame label-embedding video method (sample08–11 lineage)."""

import numpy as np

from nic.train.movie_label import MovieLabelTrainer


def _toy_movie(t=6, size=16):
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack([x, y, x * y], axis=-1)
    frames = [np.clip(base * (0.4 + 0.1 * i), 0, 1) for i in range(t)]
    return np.stack(frames).astype(np.float32)


def test_label_trainer_shapes_and_convergence():
    movie = _toy_movie()
    tr = MovieLabelTrainer(movie, num_bits=4, num_epochs=120, seed=0)
    losses = tr.train_many(120)
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    z = tr.encode()
    assert z.shape == (6, 4, 4, 8) and z.dtype == np.uint8
    rec = tr.decode(z)
    assert rec.shape == movie.shape
    # embeddings give each frame its own decode: frames differ
    assert float(np.abs(rec[0] - rec[-1]).max()) > 1e-4


def test_label_cli(tmp_path):
    from nic.data.assets import write_timelaps
    from nic.cli.movie_lavel_comp import run

    movie = (_toy_movie(4, 16) * 255).astype(np.uint8)
    p = str(tmp_path / "m.avi")
    write_timelaps(movie, p)
    psnr = run([
        "--label_embedding", "true", "--image_path", p,
        "--num_epochs", "60", "--output_root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(psnr)
