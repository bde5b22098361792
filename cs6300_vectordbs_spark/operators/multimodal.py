"""Multimodal (image/audio/video) column plumbing for training-data
pipelines. Extension surface — no counterpart in the reference (text
only); required by the 100-TB north star.

Design: media payloads are opaque ``binary`` columns travelling next to
typed metadata columns; all Spark-side plumbing (schemas, Arrow batch
shapes, partition-preserving mapInPandas) is real and tested, while the
actual codec work is STUBBED — pillow/librosa/ffmpeg are not in this
container. ``decode_image_stub`` derives deterministic fake features
from the bytes themselves so tests are stable; ``decode_image_real``
raises NotImplementedError at the exact point a codec library would
plug in (swap the body, keep the signature — the plan shape does not
change).

Scale notes: binary columns stay columnar end-to-end (parquet →
Tungsten → Arrow); decode is a map-only stage, no shuffle; frame
sampling multiplies rows map-side (explode) — partition counts should
be sized for the POST-explode row count.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import ColumnOrName, _col

IMAGE_FEATURE_SCHEMA = (
    "width int, height int, n_channels int, feature array<double>"
)


def blob_metadata(data: ColumnOrName) -> Column:
    """Typed metadata for an opaque binary column: byte length + md5 —
    pure JVM expressions, the cheap pre-filter before any decode."""
    d = _col(data)
    return F.struct(
        F.octet_length(d).alias("n_bytes"),
        F.md5(d).alias("content_md5"),
    )


def with_blob_metadata(
    df: DataFrame, data_col: str = "data", out_col: str = "meta"
) -> DataFrame:
    return df.withColumn(out_col, blob_metadata(data_col))


def decode_image_stub(
    df: DataFrame, data_col: str = "data", feature_dim: int = 8
) -> DataFrame:
    """mapInPandas image-decode stage with a deterministic FAKE decoder.

    Real deployments replace the body marked below with
    PIL.Image.open(io.BytesIO(b)); everything around it — Arrow batch
    iteration, output schema, null handling — is the production shape.
    """
    import hashlib

    import pandas as pd

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, width int, height int, n_channels int, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            widths, heights, chans, feats = [], [], [], []
            for b in pdf[data_col]:
                if b is None:
                    widths.append(None); heights.append(None)
                    chans.append(None); feats.append(None)
                    continue
                # --- STUB: replace from here with a real codec ------
                h = hashlib.md5(bytes(b)).digest()
                widths.append(16 + h[0] % 241)
                heights.append(16 + h[1] % 241)
                chans.append(3)
                feats.append([h[2 + i] / 255.0 for i in range(feature_dim)])
                # --- to here ----------------------------------------
            pdf["width"] = pd.array(widths, dtype="Int32")
            pdf["height"] = pd.array(heights, dtype="Int32")
            pdf["n_channels"] = pd.array(chans, dtype="Int32")
            pdf["feature"] = feats
            yield pdf

    return df.mapInPandas(run, schema=schema)


def decode_image_real(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Placeholder for the codec-backed decode; no image library ships
    in this environment."""
    raise NotImplementedError(
        "image codecs unavailable here — use decode_image_stub, or plug a "
        "codec into decode_image_stub's marked section"
    )


def sample_frames(
    df: DataFrame,
    n_frames_col: str = "n_frames",
    every: int = 30,
    out_col: str = "frame_idx",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (0, every, 2*every, ...) — map-side explode, no shuffle; the decode
    of each sampled frame then follows the decode_image pattern."""
    n = _col(n_frames_col).cast("int")
    last = F.floor((n - 1) / F.lit(every)).cast("int")
    idxs = F.when(
        n > 0,
        F.transform(F.sequence(F.lit(0), last), lambda i: i * every),
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(out_col, F.explode(idxs))


def extract_audio_frames(
    df: DataFrame,
    data_col: str = "data",
    frame_len: int = 256,
    hop: int = 128,
) -> DataFrame:
    """Audio feature-extraction plumbing: overlapping fixed-length
    frames over a raw byte stream (PCM-u8 shape), one output row per
    frame with mean amplitude and energy.

    The windowing/striding, Arrow batch iteration, per-frame explode,
    and output schema are the production shape; a real pipeline swaps
    the marked section for a codec + DSP (librosa/torchaudio — not in
    this container). Features are INTEGER sums divided by a power of
    two, so every value is an exact double and the whole mapInPandas
    stage is value-hash-checkable against SQL. Blobs shorter than one
    frame emit no rows (same contract as an empty audio file).
    """
    import pandas as pd

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != data_col
    )
    schema = (
        f"{fields}, frame_idx int, n_bytes bigint,"
        " f_mean double, f_energy double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                c: [] for c in pdf.columns if c != data_col
            }
            out.update(
                {"frame_idx": [], "n_bytes": [], "f_mean": [], "f_energy": []}
            )
            for _, row in pdf.iterrows():
                b = row[data_col]
                if b is None:
                    continue
                bb = bytes(b)
                n = len(bb)
                # --- STUB: replace with codec + DSP from here -------
                n_frames = 0 if n < frame_len else (n - frame_len) // hop + 1
                for f in range(n_frames):
                    w = bb[f * hop : f * hop + frame_len]
                    s = sum(w)
                    s2 = sum(x * x for x in w)
                    for c in out:
                        if c not in (
                            "frame_idx", "n_bytes", "f_mean", "f_energy"
                        ):
                            out[c].append(row[c])
                    out["frame_idx"].append(f)
                    out["n_bytes"].append(n)
                    out["f_mean"].append(s / frame_len)
                    out["f_energy"].append(s2 / frame_len)
                # --- to here ----------------------------------------
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)
