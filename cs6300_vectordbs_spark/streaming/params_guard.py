"""Resume-parameter sidecar for resumable stream drains.

A checkpointed drain (dedup probe, IVF serve, upsert sink) skips
already-committed batches on restart — so the rows sitting in the
output/table from the previous run were produced under the PREVIOUS
call's parameters. Resuming with a different parameterization
(min_jaccard, k/dim/n_probe, id/version columns), or pointing a fresh
checkpoint at an output directory populated by an unrelated drain,
would silently mix rows from two different queries into one result.

The guard: on the first checkpointed run, write the full parameter
set as ``_PARAMS.json`` into the durable directory (the output dir
for drains, the checkpoint dir for the upsert sink, whose table dir
is swapped every epoch); on every later run verify it matches and
raise a legible error on mismatch. The leading underscore keeps the
sidecar invisible to Spark's file listing (same convention as
``_SUCCESS``), so ``spark.read.parquet(out)`` never sees it.
"""

from __future__ import annotations

import json
import os


def check_params_sidecar(
    dir_path: str, params: dict, *, has_progress: bool = True
) -> None:
    """Write ``params`` to ``{dir_path}/_PARAMS.json`` on first use;
    on later use raise ``ValueError`` unless the stored parameters
    match exactly. ``params`` must be JSON-round-trippable (strings,
    ints, floats, bools, None) so equality survives serialization.

    ``has_progress``: whether the run being resumed actually
    COMMITTED anything (batch dirs for drains, epoch commits for the
    upsert sink). A sidecar whose first run died before any commit
    pins nothing — there are no rows from the old parameterization
    to mix with — so a mismatched retry just rewrites the sidecar
    instead of forcing a manual cleanup. Callers that can't tell
    pass True (the safe default: refuse)."""
    sidecar = os.path.join(dir_path, "_PARAMS.json")
    canonical = json.loads(json.dumps(params))
    if os.path.exists(sidecar):
        with open(sidecar, "r", encoding="utf-8") as f:
            stored = json.load(f)
        if stored == canonical:
            return
        if has_progress:
            raise ValueError(
                f"resume parameter mismatch at {dir_path!r}: this "
                f"directory was populated with {stored}, but the "
                f"current call requests {canonical}. Resuming would "
                "mix rows from two parameterizations into one result "
                "— use a fresh out_path/checkpoint, or the original "
                "parameters."
            )
        # fall through: no committed progress, re-pin to the new params
    os.makedirs(dir_path, exist_ok=True)
    tmp = sidecar + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(canonical, f)
    os.replace(tmp, sidecar)


def drain_has_progress(out_dir: str) -> bool:
    """Progress marker for per-batch-dir drains (dedup probe, IVF
    serve): any committed ``batch=`` directory in the output. One
    home for the convention so the two drains can't diverge."""
    return os.path.isdir(out_dir) and any(
        e.startswith("batch=") for e in os.listdir(out_dir)
    )


def checkpoint_has_progress(checkpoint_location: str) -> bool:
    """Progress marker for a Structured Streaming checkpoint: any
    entry in the ``offsets`` dir. Offsets are written BEFORE a batch
    is processed, so this is the conservative 'work may have
    happened under the old parameters' signal — the right marker
    when the guarded side effect (a table swap, a batch dir write)
    lands before the checkpoint's own ``commits`` entry, leaving a
    crash window in which ``commits`` is empty but the effect is
    already durable."""
    offsets = os.path.join(checkpoint_location, "offsets")
    return os.path.isdir(offsets) and any(
        not e.startswith(".") for e in os.listdir(offsets)
    )
