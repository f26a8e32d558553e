#!/usr/bin/env python3
"""Adversarial oracle replay — the fixture contract, stress-tested.

Perturbs a driver fixture directory (nulls, zeros, negatives, hostile
unicode/empty/repetitive text, zero vectors, huge norms) WITHOUT touching
primary-key columns, writes the result to an output directory with the same
table names/schemas, then the normal Verify + oracle_check pipeline replays
the full corpus against DuckDB on it:

    python3 tools/adversarial_replay.py /root/testdata/sf0.001 /tmp/advdata 1311
    sbt -batch "runMain graft.Verify /tmp/advdata /tmp/verify_adv"
    python3 tools/oracle_check.py /tmp/advdata /tmp/verify_adv

Interpretation:
  - a query that CRASHES is an engine defect (the round-11 run found four:
    a streaming null-value NOT_NULL kill, an unguarded pct_change divide, a
    typed-map NPE on null text, and a loud-guard firing a query should have
    coalesced) — fix those;
  - a hash MISMATCH is usually an engine-vs-DuckDB semantic divergence on
    OUT-OF-CONTRACT data (the oracle SQL replicates the engine on the
    fixtures, e.g. its ASCII tokenizer regex vs the engine's unicode one) —
    triage, but only fix when the engine side is genuinely wrong.

Report mode (the machine-readable triage gate, round-13 verdict item 4):

    python3 tools/oracle_check.py /tmp/advdata /tmp/verify_adv /tmp/adv_check.json
    python3 tools/adversarial_replay.py --report /tmp/adv_check.json ADVERSARIAL_r13.json 13

Every hash mismatch must carry a `divergence_class` from the CLOSED class
list below (TRIAGE). An unclassified mismatch — or a classified one whose
class is not in DIVERGENCE_CLASSES — FAILS the gate (exit 1): new
divergences get triaged when they appear, not re-audited round after
round. A triaged query that now MATCHES is reported as stale (warning
only — perturbation seeds move).

Expected state after round 15: 0 crashes, full-corpus hash-match, TRIAGE
empty — on a FRESH seed each round (recorded in the artifact for replay).
"""
import json
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# The CLOSED divergence-class list. Every class names a verified (or, where
# noted in the reason, strongly suspected same-kernel) engine-vs-DuckDB
# semantic difference on OUT-OF-CONTRACT input — not an engine defect. A
# mismatch that fits none of these is NEW and must be triaged (and this
# list extended deliberately) before the artifact will generate.
DIVERGENCE_CLASSES = {
    "tokenizer-unicode": (
        "hostile-unicode text (emoji surrogates, CJK, whitespace-only docs) "
        "tokenized/split differently by the engine's Java/UTF-16 native "
        "kernels vs the oracle SQL's RE2/codepoint regex — includes "
        "everything directly downstream of the token/shingle sets "
        "(signatures, LSH buckets, gram joins)"),
    "utf16-vs-codepoint": (
        "char-level kernels (entropy, substr/len scans) count UTF-16 code "
        "units in the JVM vs Unicode codepoints in DuckDB — emoji and "
        "astral-plane chars count 2 vs 1"),
    "null-text-contract": (
        "null/empty text rows: the engine's documented null passthrough "
        "(null text -> null digest/empty asset, row kept) vs the oracle "
        "SQL's null propagation through CASE/list/join expressions "
        "(row dropped or re-keyed)"),
    "null-measure-agg": (
        "null numeric measures inside window/aggregate frames: engine "
        "typed aggregates skip nulls (or yield NaN on degenerate frames) "
        "where the oracle's expression arithmetic pairwise-drops or "
        "propagates them differently"),
    "null-field-contract": (
        "null label/partition fields change row membership or grouping "
        "between the sides (null-skip concat, null-label vector rows)"),
    "null-rank-ties": (
        "rank/fractional-rank statistics under nulled inputs and the mass "
        "ties the perturbation creates (zeroed quantities)"),
    "float-ulp-round-boundary": (
        "a round-to-4-decimals knife-edge on a float aggregate whose "
        "partial-sum/algorithm order differs between Spark (running "
        "update) and DuckDB (block aggregation): the unrounded values "
        "differ by ~1e-13 across an exact .xxxx5 boundary, so the rounded "
        "cell differs in the last decimal — the q01-at-sf1.0 ulp class, "
        "surfacing under perturbation-created mass ties"),
    "dup-mass-bucket-cap": (
        "the engine's documented hot-bucket cap / duplicate-mass guards "
        "bound candidate pairs where the oracle replays the uncapped "
        "quadratic join — pathological duplicate mass (planted exact-dup "
        "blocks, identical hostile texts) diverges by design"),
}

# query -> (divergence_class, one-line reason). EMPTY as of round 14: the
# r14 char-unit unification (codepoint vocab scans), the engine fixes it
# surfaced (pairwise-complete safeCorr, snapshotDiff presence flags,
# qualityStruct null gate), and ~25 oracle-replay alignments (degenerate
# shingle grams, null-text propagation, struct-packed arg_min/arg_max,
# null-safe joins, NOT-IN null traps, CJK langid branch, list_sum([]) and
# least(NULL) quirks) emptied every divergence class — the replay now
# matches 207/207 on the canonical seed. A future mismatch is NEW: row-diff
# it (oracle_check.py embeds the evidence) and either fix the engine (any
# crash or genuine defect) or, for a true out-of-contract semantic gap,
# triage it here with a class from DIVERGENCE_CLASSES.
# EMPTY since r16: the one remaining entry (q134 float-ulp-round-boundary,
# a 5.7e-14 var_samp summation-order gap across an exact round(,4) edge)
# was retired by respelling the q134 oracle pair on exact DECIMAL prefix
# sums with bit-identical IEEE arithmetic on both sides — the class is
# structurally empty now, not just unobserved on this seed.
TRIAGE = {}

# class -> oracle_check shapes ("rows" | "value" | "columns") the class can
# legitimately produce; a classified mismatch whose observed shape is not
# allowed contradicts its classification and fails the gate. Row-count
# shapes are allowed only for classes whose divergence can re-key or drop
# rows (token/gram joins, null-row contracts, capped buckets).
CLASS_SHAPES = {
    "tokenizer-unicode": {"value", "rows"},
    "utf16-vs-codepoint": {"value"},
    "null-text-contract": {"value", "rows"},
    "null-measure-agg": {"value"},
    "null-field-contract": {"value", "rows"},
    "null-rank-ties": {"value"},
    "dup-mass-bucket-cap": {"value", "rows"},
    "float-ulp-round-boundary": {"value"},
}
assert set(CLASS_SHAPES) == set(DIVERGENCE_CLASSES), \
    "CLASS_SHAPES must cover exactly the closed class list"


def _is_crash(v: dict) -> bool:
    """oracle_check.py records an explicit crashed flag (r14); fall back to
    the legacy 'error:' err prefix for old check files."""
    if "crashed" in v:
        return bool(v["crashed"])
    return str(v.get("err", "")).startswith("error:")


def report(check_path: str, out_path: str, round_no: str) -> int:
    check = json.load(open(check_path))
    rec = check.get("queries", check)
    mismatches = sorted(
        k for k, v in rec.items() if isinstance(v, dict) and not v.get("match", False))
    crashes = sorted(
        k for k, v in rec.items()
        if isinstance(v, dict) and not v.get("match", False) and _is_crash(v))
    unclassified = [q for q in mismatches if q not in TRIAGE and q not in crashes]
    bad_class = [q for q in mismatches
                 if q in TRIAGE and TRIAGE[q][0] not in DIVERGENCE_CLASSES]
    stale = sorted(q for q in TRIAGE if q not in mismatches)
    if stale:
        print(f"note: {len(stale)} triaged queries now match (stale entries, "
              f"perturbation seeds move): {', '.join(stale)}", file=sys.stderr)
    gate_fail = False
    # A crash is an ENGINE DEFECT and fails the gate unconditionally — TRIAGE
    # only ever excuses semantic divergences, never exceptions (r13 ADVICE:
    # a query that starts crashing while listed in TRIAGE must not pass).
    for q in crashes:
        print(f"GATE FAIL: {q} CRASHED ({str(rec[q].get('err'))[:160]}) — crashes are "
              "engine defects; fix the engine, never triage a crash", file=sys.stderr)
        gate_fail = True
    for q in unclassified:
        print(f"GATE FAIL: {q} diverges with NO divergence_class — triage it "
              "(row-diff the outputs, pick/extend a class in TRIAGE)", file=sys.stderr)
        gate_fail = True
    for q in bad_class:
        print(f"GATE FAIL: {q} carries class '{TRIAGE[q][0]}' which is not in "
              "the closed DIVERGENCE_CLASSES list", file=sys.stderr)
        gate_fail = True
    # Per-query evidence gate: every mismatch must carry the row-diff
    # evidence oracle_check.py records (shape + first diverging row/cell or
    # membership examples). Evidence is recomputed every run — a
    # classification can no longer be inherited from a kernel family.
    mismatch_entries = []
    for q in mismatches:
        if q in crashes:
            continue
        v = rec[q]
        shape = v.get("shape")
        evidence = v.get("evidence")
        if shape is None or (shape in ("rows", "value") and not evidence):
            print(f"GATE FAIL: {q} has no row-diff evidence in {check_path} — "
                  "regenerate it with the current tools/oracle_check.py",
                  file=sys.stderr)
            gate_fail = True
            continue
        if q not in TRIAGE:
            continue  # already GATE FAILed above as unclassified
        allowed = CLASS_SHAPES.get(TRIAGE[q][0], set())
        if shape not in allowed:
            print(f"GATE FAIL: {q} is classified '{TRIAGE[q][0]}' (allowed shapes "
                  f"{sorted(allowed)}) but diverged with shape '{shape}' — the "
                  "classification does not match the observed diff; re-triage",
                  file=sys.stderr)
            gate_fail = True
            continue
        mismatch_entries.append({
            "query": q, "divergence_class": TRIAGE[q][0], "reason": TRIAGE[q][1],
            "shape": shape,
            "rows_engine": v.get("rows_engine"), "rows_oracle": v.get("rows_oracle"),
            "evidence": evidence})
    if gate_fail:
        return 1
    seed = check.get("seed")
    adv_source = check.get("adv_source")
    artifact = {
        "round": round_no,
        "seed": seed,
        # exact replay only when the dataset recorded its provenance —
        # a fabricated command would regenerate a DIFFERENT corpus
        "replay": (None if seed is None or adv_source is None else
            f"python3 tools/adversarial_replay.py {adv_source} /tmp/advdata {seed} && "
            "sbt -batch 'runMain graft.Verify /tmp/advdata /tmp/verify_adv' && "
            "python3 tools/oracle_check.py /tmp/advdata /tmp/verify_adv /tmp/adv_check.json"),
        "source": check.get("sf_dir", None),
        "queries": len(rec),
        "crashes": len(crashes),
        "hash_matches": len(rec) - len(mismatches),
        "hash_mismatches": len(mismatches),
        "crash_list": crashes,
        "divergence_classes": DIVERGENCE_CLASSES,
        "mismatch_list": mismatch_entries,
        "note": (
            "0 crashes = 0 engine defects on adversarial data (the gate; a crash "
            "fails generation unconditionally, triaged or not). Every hash "
            "mismatch carries a divergence_class from the CLOSED list above AND "
            "per-query row-diff evidence recomputed THIS run (first diverging "
            "cell/membership examples, shape-checked against the class) — all "
            "are engine-vs-DuckDB semantic differences on OUT-OF-CONTRACT "
            "input, none an engine defect."),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}: {artifact['hash_matches']}/{artifact['queries']} match, "
          f"{len(mismatch_entries)} classified divergences, {len(crashes)} crashes")
    return 0

HOSTILE_TEXTS = [
    "", " ", "\n\n\n", "a", "THE the The tHe", "naive cafe uber facade",
    "line1\nline1\nline2\nline1", "tab\tsep\tvals", 'quo"ted, and ,commas',
    "ééé café 中文文档测试 русский نص عربي",
    "zzz " * 500,
    "\U0001F600\U0001F680 emoji doc \U0001F4A9",
    "the and of to is " * 40,
    "x" * 3000,
    "1 2 3 4 5 6 7 8 9 10 11 12",
    "Mixed CASE With... ellipsis… and bullets:\n* one\n* two\n- three",
    # r15 additions — three shapes the first 16 never covered:
    # astral LETTERS (Gothic/Deseret are \p{L} unlike emoji, so they form
    # WORDS and flow through tokenize/shingle/BPE paths as surrogate pairs
    # — the deepest codepoint-contract stress, not just separator handling)
    "\U00010330\U00010331\U00010332 gothic \U00010400\U00010401 deseret "
    "\U00010330\U00010331\U00010332 twice",
    # combining marks: NFC-unnormalized e+U+0301 sequences, stacked marks,
    # and a standalone leading mark (category Mn -- the tokenizer's
    # letter/number classes exclude Mn, so combining marks split words
    # mid-glyph BY CONTRACT; the oracle regex must agree)
    "e\u0301 combining e\u0301e\u0301 z\u0335\u0327algo text a\u0300 "
    "mark \u0301alone",
    # one megadoc: ~8k chars / ~1.3k words on one line (length-path and
    # per-doc kernel-buffer stress, 2.7x the prior hostile max). Bounded at
    # 8k BY THE ORACLE, not the engine: the q200 piece-scan oracle
    # accumulates its piece string per recursive step -- quadratic in doc
    # length -- so a 100k-char doc takes hours to REPLAY while the engine
    # handles it in milliseconds (measured before bounding).
    ("lorem ipsum dolor sit amet " + "consectetur adipiscing elit sed do "
     ) * 130,
]

PASSTHROUGH = ["customer", "nation", "orders", "part", "region", "supplier"]


def perturb_documents(src, dst):
    t = pq.read_table(f"{src}/documents.parquet").to_pydict()
    n = len(t["doc_id"])
    for i in range(n):
        r = random.random()
        if r < 0.12:
            t["text"][i] = random.choice(HOSTILE_TEXTS)
        elif r < 0.20:
            t["text"][i] = None
        if random.random() < 0.10:
            t["lang"][i] = None
        if random.random() < 0.10:
            t["source"][i] = None
        if random.random() < 0.05:
            t["n_chars"][i] = None
        elif random.random() < 0.05:
            t["n_chars"][i] = 0
    for i in range(0, min(n, 40), 4):  # exact-dup text under distinct ids
        t["text"][i] = t["text"][(i + 1) % n]
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/documents.parquet")),
        f"{dst}/documents.parquet")


def perturb_events(src, dst):
    t = pq.read_table(f"{src}/events.parquet").to_pydict()
    for i in range(len(t["event_id"])):
        if random.random() < 0.10:
            t["value"][i] = None
        elif random.random() < 0.05:
            t["value"][i] = 0.0
        elif random.random() < 0.03:
            t["value"][i] = -abs(t["value"][i] or 1.0)
        if random.random() < 0.08:
            t["props"][i] = None
        if random.random() < 0.04:
            t["event_type"][i] = None
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/events.parquet")),
        f"{dst}/events.parquet")


def perturb_embeddings(src, dst):
    t = pq.read_table(f"{src}/embeddings.parquet").to_pydict()
    dim = len(t["embedding"][0])
    for i in range(len(t["vec_id"])):
        r = random.random()
        if r < 0.04:
            t["embedding"][i] = [0.0] * dim  # zero vector: no direction
        elif r < 0.07:
            t["embedding"][i] = [v * 1e6 for v in t["embedding"][i]]
        if random.random() < 0.08:
            t["label"][i] = None
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/embeddings.parquet")),
        f"{dst}/embeddings.parquet")


def perturb_lineitem(src, dst):
    t = pq.read_table(f"{src}/lineitem.parquet").to_pydict()
    for i in range(len(t["l_orderkey"])):
        if random.random() < 0.06:
            t["l_quantity"][i] = None
        elif random.random() < 0.03:
            t["l_quantity"][i] = 0.0
        if random.random() < 0.04:
            t["l_discount"][i] = 0.0
        if random.random() < 0.04:
            t["l_tax"][i] = None
    pq.write_table(
        pa.table(t, schema=pq.read_schema(f"{src}/lineitem.parquet")),
        f"{dst}/lineitem.parquet")


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--report":
        if len(sys.argv) < 4:
            sys.exit(f"usage: {sys.argv[0]} --report <oracle_check.json> <out.json> [round]")
        sys.exit(report(sys.argv[2], sys.argv[3],
                        sys.argv[4] if len(sys.argv) > 4 else "?"))
    if len(sys.argv) < 3:
        sys.exit(f"usage: {sys.argv[0]} <fixture-dir> <out-dir> [seed]  |  "
                 f"{sys.argv[0]} --report <oracle_check.json> <out.json> [round]")
    src, dst = sys.argv[1], sys.argv[2]
    # Seed-logged property discipline (r14 verdict item 7): a FRESH seed per
    # run by default, so each round's sweep explores a new hostile corpus
    # instead of re-verifying the same two fixed ones. The seed is recorded
    # in the dataset dir (oracle_check copies it into its JSON, the report
    # carries it + replay instructions) — any finding replays exactly by
    # passing the recorded seed as argv[3].
    if len(sys.argv) > 3:
        seed = int(sys.argv[3])
    else:
        seed = random.SystemRandom().randrange(2**31)
        print(f"fresh adversarial seed: {seed} (replay: pass it as the 3rd arg)")
    random.seed(seed)
    import os
    os.makedirs(dst, exist_ok=True)
    perturb_documents(src, dst)
    perturb_events(src, dst)
    perturb_embeddings(src, dst)
    perturb_lineitem(src, dst)
    for t in PASSTHROUGH:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    with open(f"{dst}/adversarial_seed.json", "w") as f:
        json.dump({"seed": seed, "source": src,
                   "replay": f"python3 tools/adversarial_replay.py {src} <dst> {seed}"}, f)
    print(f"adversarial dataset written to {dst} (seed {seed})")


if __name__ == "__main__":
    main()
