"""Regenerate ATTESTATIONS.json — the rework-aware attestation sidecar.

Run at ROUND START, immediately after the driver's new CORRECTNESS_r{N}.json
lands and BEFORE any code edits: at that moment the repo head is exactly the
code the round-N driver executed, so stamping the current ``src_fingerprint``
for every id attested in round N is faithful. Ids attested in older rounds
keep their previously stamped fingerprint (their attestation ran against
older code); ids with no prior sidecar entry are bootstrap-stamped with the
current fingerprint unless listed via ``--stale`` (known reworked-since-
attestation ids, e.g. llm_sim_hnsw whose r6 row predates its r7 rewrite).

``__spark_entry__.queries()`` then orders any id whose CURRENT fingerprint
mismatches its stamped one as never-attested, pulling reworked code back
into the driver's 50-id verification prefix immediately.

If the FINGERPRINT ALGORITHM itself changes (``src_fingerprint`` /
``_code_names``), a plain regen is NOT enough: kept entries were stamped
under the old algorithm and would all mismatch, flooding the prefix with
false-stale ids. Regenerate FAITHFULLY instead, as done in round 8: for
each attested round R, `git worktree add <dir> <round-R driver commit>^`
(the code the round-R driver actually executed), compute each id's
fingerprint THERE with the NEW algorithm (standalone copy of the
fingerprint functions, cwd = worktree), and rebuild the sidecar from
those per-round stamps. Ids genuinely reworked since their attestation
then surface as stale on their own merits.

Usage: python tools_attest.py [--stale id1,id2,...]
"""

from __future__ import annotations

import argparse
import json
import os

import __spark_entry__ as entry_mod

_SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ATTESTATIONS.json")


def regenerate(registry, latest, existing, stale, fingerprint):
    """Pure sidecar rebuild: returns (sidecar, stamped, kept, overridden).

    A prior entry whose round matches the id's latest attested round is
    ALWAYS kept — including at the just-landed max round. A second regen
    later in the round (after code edits) must not re-stamp post-edit
    fingerprints onto rows the driver earned against pre-edit code; that
    would silently certify reworked code and defeat the rework detector
    this tool exists to serve (r8 ADVICE item 1)."""
    maxr = max(latest.values(), default=0)
    sidecar: dict[str, dict] = {}
    stamped = kept = overridden = 0
    for qid, fn in registry.items():
        rnd = latest.get(qid, 0)
        if rnd == 0:
            continue  # never attested; orders first already
        if qid in stale:
            sidecar[qid] = {"round": rnd, "fp": f"stale:reworked-after-r{rnd}"}
            overridden += 1
            continue
        prior = existing.get(qid)
        if isinstance(prior, dict) and prior.get("round") == rnd:
            sidecar[qid] = prior  # attestation unchanged; keep the earned fp
            kept += 1
        elif rnd == maxr:
            # FIRST stamp for the just-landed round (head == the
            # driver-executed code, so the current fingerprint is faithful).
            sidecar[qid] = {"round": rnd, "fp": fingerprint(fn)}
            stamped += 1
        else:
            # rnd < maxr but no matching prior entry (a regen was skipped a
            # round, or the sidecar was lost): the head may have diverged
            # from the code round-rnd executed, so stamping the current fp
            # would silently certify possibly-reworked code. Fail
            # CONSERVATIVE: the stale sentinel orders the id never-attested
            # and the next driver row re-attests it (review finding, r8).
            sidecar[qid] = {"round": rnd, "fp": f"stale:unstamped-r{rnd}"}
            overridden += 1
    return sidecar, stamped, kept, overridden


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--stale",
        default="",
        help="comma-separated ids known reworked since their last attestation; "
        "stamped with a sentinel fingerprint so they order as never-attested",
    )
    args = ap.parse_args()
    stale = {s for s in args.stale.split(",") if s}

    registry: dict = {}
    for mod in entry_mod._MODULES:
        registry.update(mod.QUERIES)
    latest = entry_mod.latest_attested_round()

    try:
        with open(_SIDECAR) as fh:
            existing = json.load(fh)
    except (OSError, ValueError):
        existing = {}

    sidecar, stamped, kept, overridden = regenerate(
        registry, latest, existing, stale, entry_mod.src_fingerprint
    )
    maxr = max(latest.values(), default=0)

    with open(_SIDECAR, "w") as fh:
        json.dump(sidecar, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"ATTESTATIONS.json: {len(sidecar)} ids (stamped {stamped}, kept {kept}, "
        f"stale-overridden {overridden}); latest driver round r{maxr}"
    )


if __name__ == "__main__":
    main()
