"""Host-side asset I/O: images, AVI video, npy LUTs, mip chains.

Everything here stays on the host and out of jit (the reference keeps
OpenCV/PIL on the CPU too — utils.py:67-94, image_compression.py:429-477 of
21K1113/Neural_Image_Compression_V2). Arrays are float32 CHW (/CTHW) in
[0, 1], the layout the trainers upload to device once per run.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "asset_kind",
    "load_image_mips",
    "read_clip",
    "write_timelaps",
    "load_volume",
    "flatten_3d_to_2d",
    "unflatten_2d_to_3d",
    "save_png",
    "save_lut_csv",
]


def asset_kind(path: str) -> str:
    """File extension → data kind (utils.py:330-336 semantics)."""
    ext = os.path.splitext(path)[1][1:].lower()
    if ext in ("npy", "npz"):
        return "ndarray"
    if ext in ("avi", "mp4"):
        return "movie"
    if ext in ("png", "jpg", "jpeg"):
        return "image"
    raise ValueError(f"unsupported asset extension: {ext!r}")


def load_image_mips(path: str, image_size: int, max_mip_level: int,
                    image_size_w: int = 0) -> list[np.ndarray]:
    """RGB image → list of [3, H/2^i, W/2^i] float32 mips in [0,1].

    Parity with the reference's PIL Resize + ToTensor mip chain
    (image_compression.py:429-442): bilinear resize of the *original* per
    mip (not successive halving). ``image_size_w`` (0 = square) selects
    native rectangular geometry — with H, W matching the file, no
    resampling happens at mip 0."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w0 = image_size_w or image_size
    mips = []
    for i in range(max_mip_level + 1):
        h = image_size // (2**i)
        w = w0 // (2**i)
        if (w, h) == img.size:
            resized = img
        else:
            resized = img.resize((w, h), Image.BILINEAR)
        arr = np.asarray(resized, dtype=np.float32) / 255.0  # [H, W, 3]
        mips.append(arr.transpose(2, 0, 1))  # [3, H, W]
    return mips


def _riff_chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _read_avi_raw_dib(path: str) -> np.ndarray | None:
    """Pure-python reader for AVIs carrying uncompressed DIB video
    ('00db' chunks, BI_RGB 24-bit) — the format of the reference's bundled
    misty_*.avi assets. Returns [T, H, W, 3] uint8 in BGR top-down order
    (what cv2 would produce), or None if the file is not raw-DIB."""
    data = open(path, "rb").read()
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    strf = data.find(b"strf")
    if strf < 0:
        return None
    bih = data[strf + 8 : strf + 8 + 40]  # BITMAPINFOHEADER
    width = int.from_bytes(bih[4:8], "little", signed=True)
    height = int.from_bytes(bih[8:12], "little", signed=True)
    bit_count = int.from_bytes(bih[14:16], "little")
    compression = int.from_bytes(bih[16:20], "little")
    if compression != 0 or bit_count != 24:  # BI_RGB only
        return None
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    frames = []
    pos = data.find(b"movi")
    if pos < 0:
        return None
    for fourcc, payload, size in _riff_chunks(data, pos + 4, len(data)):
        if fourcc[2:4] in (b"db", b"dc") and size >= row_bytes * height:
            raw = np.frombuffer(data, np.uint8, count=row_bytes * height,
                                offset=payload)
            frame = raw.reshape(height, row_bytes)[:, : width * 3]
            frame = frame.reshape(height, width, 3)
            frames.append(frame[::-1] if bottom_up else frame)
    if not frames:
        return None
    return np.stack(frames)


def read_clip(path: str) -> np.ndarray:
    """AVI/MP4 → [T, H, W, 3] uint8 (BGR, as the reference reads it —
    utils.py:67-80 uses raw cv2 frames; colour order round-trips through
    the matching writer).

    Raw-DIB AVIs decode through the pure-python RIFF reader (this image's
    OpenCV corrupts the heap demuxing them); everything else via cv2."""
    if path.lower().endswith(".avi"):
        raw = _read_avi_raw_dib(path)
        if raw is not None:
            return raw.astype(np.uint8)
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames).astype(np.uint8)


def write_timelaps(movie: np.ndarray, path: str, frame_rate: int = 32) -> None:
    """[T, H, W, 3] uint8 → mp4v-encoded AVI (utils.py:85-94 semantics,
    but frame count/size derived from the array instead of fixed 64×64)."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    t, h, w, _ = movie.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    video = cv2.VideoWriter(path, fourcc, frame_rate, (w, h))
    for i in range(t):
        video.write(np.ascontiguousarray(movie[i]))
    video.release()


def load_volume(path: str, image_bits: int = 8) -> np.ndarray:
    """Movie/ndarray asset → [T, H, W, 3] float array of b-bit code values
    (0..2^b-1), re-quantized like image_compression.py:443-449."""
    from nic.core.quant import quantize, normalize_from_bit, scale_to_bit

    if asset_kind(path) == "movie":
        vol = read_clip(path).astype(np.float64)
    else:
        vol = np.load(path).astype(np.float64)
    # quantize_from_bit_to_bit parity (models.py:44-45)
    return np.asarray(scale_to_bit(quantize(normalize_from_bit(vol, image_bits), image_bits), image_bits))


def flatten_3d_to_2d(volume: np.ndarray, image_size: int) -> np.ndarray:
    """[T, S, S, 3] → one [R, R, 3] tile sheet (method 2,
    image_compression.py:453-459): frame i goes to tile
    (i // (R/S), i % (R/S))."""
    t, s = volume.shape[0], volume.shape[1]
    per_row = image_size // s
    sheet = np.zeros((image_size, image_size, volume.shape[3]), dtype=volume.dtype)
    for i in range(t):
        r, c = divmod(i, per_row)
        sheet[r * s : (r + 1) * s, c * s : (c + 1) * s] = volume[i]
    return sheet


def unflatten_2d_to_3d(sheet: np.ndarray, frame_size: int, num_frames: int) -> np.ndarray:
    """Inverse of :func:`flatten_3d_to_2d` (image_compression.py:414-421)."""
    per_row = sheet.shape[0] // frame_size
    frames = []
    for i in range(num_frames):
        r, c = divmod(i, per_row)
        frames.append(
            sheet[r * frame_size : (r + 1) * frame_size, c * frame_size : (c + 1) * frame_size]
        )
    return np.stack(frames)


def save_png(image_u8: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(image_u8).save(path)


def save_lut_csv(lut: np.ndarray, path: str) -> None:
    """[S, S, S, 3] LUT → CSV rows over (diag_angle, angle) with refangle·3
    values per row (utils.py:97-113 layout, sample22-x export)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    s = lut.shape[0]
    with open(path, "w") as f:
        for a in range(s):
            for b in range(s):
                row = ",".join(
                    str(float(lut[a, b, r, c])) for r in range(s) for c in range(3)
                )
                f.write(row + ",\n")
