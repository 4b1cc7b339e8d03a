#!/usr/bin/env python3
"""Fail the round when prose claims drift from the correctness artifact.

Round 8 shipped "116 oracle + 6 rows-only — every oracle query
hash-matches" in COVERAGE.md while CORRECTNESS_r08.json recorded a
hash_match:false row. This gate makes that structurally impossible: every
"<N> oracle + <M> rows-only" count claim in COVERAGE.md / README.md must
match the artifact, and any "every oracle query hash-matches" style claim
must coexist with zero failing rows.

Usage: python3 tools/claims_check.py [CORRECTNESS_json]
  (default: the newest CORRECTNESS_r*.json in the repo root — or a local
   check_oracle.py-compatible replay summary passed explicitly)

Exit 0 iff all claims are consistent with the artifact.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def artifact_counts(path):
    d = json.load(open(path))
    n_pass = n_rows_only = n_fail = 0
    fails = []
    red_queries = set()
    for name, row in d.items():
        if row.get("err") == "no_oracle":
            if (row.get("spark_rows") or 0) > 0:
                n_rows_only += 1
            else:
                n_fail += 1
                fails.append(f"{name}: no_oracle with 0 rows")
                red_queries.add(name)
        elif row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
            n_pass += 1
        else:
            n_fail += 1
            fails.append(
                f"{name}: rows={row.get('rows_match')} schema={row.get('schema_match')} "
                f"hash={row.get('hash_match')} err={row.get('err')}")
            red_queries.add(name)
    return len(d), n_pass, n_rows_only, n_fail, fails, red_queries


# Count-claim shapes this repo's prose uses. Each must match the artifact.
CLAIM_RE = re.compile(r"(\d+)\s+oracle(?:-match(?:ed)?)?\s*\+\s*(\d+)\s+rows-only")
PERFECTION_RE = re.compile(r"[Ee]very oracle query hash-matches")

# Per-query status claims: a line that names a suite query AND calls it
# fixed/green/passing must have a green artifact row for that query. The
# d34 "fixed" claim shipped wrong two rounds running (8: wrong diagnosis;
# 9: the fix text stayed while HEAD carried a committed mutation) — counts
# alone can't catch a mislabeled single row.
QUERY_NAME_RE = re.compile(r"\b([a-z]\d{2}[a-z]?_[a-z0-9_]+)\b")
STATUS_CLAIM_RE = re.compile(
    r"\b(fixed|green|resolved|hash-match(?:es|ed)|now passes)\b", re.I)
# negated/forward-looking phrasings that legitimately pair a query name
# with a status word. ADJACENCY-ONLY: a bare 'must'/'would'/'red' anywhere
# in the line must NOT exempt it ("d34 fixed — must stay green" is a
# status claim, not a negation), so each pattern binds the qualifier to
# the status word it negates.
NEGATION_RE = re.compile(
    r"\bnot\s+(yet\s+)?(fixed|green|resolved|passing)\b"
    r"|\bun-?fixed\b"
    r"|\b(stays?|remains?|still|went|was|is)\s+red\b"
    r"|\buntil\b[^.;]{0,80}\b(fixed|green|resolved|passes|lands)\b"
    r"|\b(would|should|will)\s+(be\s+)?(fixed|green|resolved|pass)", re.I)


# Stale-artifact citations: prose presenting CORRECTNESS_r{K} as the
# current evidence when the GRADED artifact is newer reads one round
# behind (the r10 COVERAGE.md header narrated the r09 artifact as
# shipped state). A line may cite an older artifact ONLY when explicitly
# marked as history with '(historical)' on the same line.
#
# Judged against the round of the artifact being CHECKED, not the max
# over the glob (round-12 fix): the driver drops CORRECTNESS_r{N}.json
# into the tree BEFORE any prose refresh can happen, so a max-over-glob
# rule failed the very round that produced the artifact (verified in
# round 11). The graded artifact's round is what the prose could
# actually have known about when it was written.
ARTIFACT_CITE_RE = re.compile(r"\bCORRECTNESS_r(\d+)(?:\.json)?\b")
HISTORY_MARK = "(historical)"


# Bench-number claims: a line that names a committed bench entry
# (backtick-quoted key present in BENCH_LOCAL.json) AND states measured
# seconds ("12.3 s" / "11–14 s") must have at least ONE seconds-claim on
# the line whose ±15%-widened interval covers the committed value — the
# round-11 README carried "11–14 s exact" while the committed artifact
# said 9.17 s (stale in the conservative direction, still a drifted
# claim). Lines that cite a key without claiming seconds are exempt:
# this is a drift tripwire on stated measurements, not a proof.
BENCH_KEY_RE = re.compile(r"`([a-z][a-z0-9_]+)`")
SECONDS_RE = re.compile(
    r"(\d+(?:\.\d+)?)(?:\s*[–—-]\s*(\d+(?:\.\d+)?))?\s*s(?:ec)?\b")
BENCH_TOL = 0.15


def bench_local_queries():
    p = os.path.join(ROOT, "BENCH_LOCAL.json")
    if not os.path.exists(p):
        return {}
    try:
        d = json.load(open(p))
        return {k: v for k, v in d.get("queries", {}).items()
                if isinstance(v, (int, float)) and v >= 0}
    except Exception:
        return {}


def _bench_exempt(k):
    # gauges (rows / MB) aren't seconds; suite-query ids (q02_…, d28_…)
    # appear in prose as ORACLE-QUERY names far more often than as bench
    # claims — restrict the rule to headline/gate entry names, where a
    # citation + seconds on one line is reliably a measurement claim
    return (k.endswith("_rows") or k.endswith("_state_mb")
            or QUERY_NAME_RE.fullmatch(k))


def _line_bench_errors(line, keys, bench, where):
    """Shared core of the seconds-claim drift rule: `keys` are the
    (position, key) citations found on the line; every key that some
    seconds SPAN claims as its nearest citation must be covered by SOME
    span on the line within ±15% (round-12 advisor: requiring every key
    on the line to be covered spurious-fails prose that cites two entries
    while stating seconds for only one). Lines marked '(historical)' are
    exempt at the call sites."""
    errs = []
    spans = [(m.start(), float(m.group(1)),
              float(m.group(2) or m.group(1)))
             for m in SECONDS_RE.finditer(line)]
    if not keys or not spans:
        return errs
    claimed = {min(keys, key=lambda kk: abs(kk[0] - spos))[1]
               for spos, _, _ in spans}
    for k in sorted(claimed):
        v = bench[k]
        if not any(lo * (1 - BENCH_TOL) <= v <= hi * (1 + BENCH_TOL)
                   for _, lo, hi in spans):
            errs.append(
                f"{where} cites bench entry `{k}` with a seconds "
                f"claim, but no claimed value/range on the line covers the "
                f"committed {v:.3g} s within ±{int(BENCH_TOL*100)}% "
                f"(BENCH_LOCAL.json) — refresh the claim or mark it "
                f"'(historical)'")
    return errs


def check_bench_claims(doc, bench):
    """Lines citing a BENCH_LOCAL key + claiming seconds must be current."""
    errs = []
    path = os.path.join(ROOT, doc)
    if not os.path.exists(path) or not bench:
        return errs
    for lineno, line in enumerate(open(path).read().splitlines(), 1):
        # same escape hatch as artifact citations: a line narrating an
        # OLD round's number as history is exempt when marked
        if HISTORY_MARK in line:
            continue
        keys = [(m.start(), m.group(1))
                for m in BENCH_KEY_RE.finditer(line)
                if m.group(1) in bench and not _bench_exempt(m.group(1))]
        errs.extend(_line_bench_errors(line, keys, bench, f"{doc}:{lineno}"))
    return errs


# Scala doc comments narrate measurements too, and they rot the same way
# prose does (the round-14 Bench.scala decomposition comment carried a
# stale wall the .md-only gate could not see). Scan COMMENT lines of
# src/main/scala AND src/test/scala (specs narrate recall/wall numbers
# just like main-tree comments) for a headline-entry name + a seconds
# claim; keys appear BARE in Scala comments, so the citation regex is the
# key names themselves, word-bounded. Code lines are never scanned (a
# literal like capped("x", 600, …) is a cap, not a claim). Each comment
# line is ALSO matched joined with its successor comment line: a Scaladoc
# sentence that wraps so the entry name and its seconds value land on
# adjacent lines used to escape the strictly line-based scan entirely
# (round-15 advisor false negative).
SRC_COMMENT_RE = re.compile(r"^\s*(//|\*|/\*\*?)")
SRC_COMMENT_LEAD_RE = re.compile(r"^\s*(//|/\*\*?|\*+/?)\s?")
SRC_SCAN_ROOTS = ("src/main/scala", "src/test/scala")


def check_src_comment_bench_claims(bench):
    errs, seen = [], set()
    headline = sorted(k for k in bench if not _bench_exempt(k))
    if not headline:
        return errs
    key_re = re.compile(r"\b(" + "|".join(map(re.escape, headline)) + r")\b")
    for root in SRC_SCAN_ROOTS:
        src_root = os.path.join(ROOT, root)
        if not os.path.isdir(src_root):
            continue
        for dirpath, _, names in os.walk(src_root):
            for n in sorted(names):
                if not n.endswith(".scala"):
                    continue
                p = os.path.join(dirpath, n)
                rel = os.path.relpath(p, ROOT)
                lines = open(p).read().splitlines()
                is_c = [bool(SRC_COMMENT_RE.match(l)) for l in lines]
                for i, line in enumerate(lines):
                    if not is_c[i] or HISTORY_MARK in line:
                        continue
                    windows = [line]
                    if i + 1 < len(lines) and is_c[i + 1] \
                            and HISTORY_MARK not in lines[i + 1]:
                        windows.append(
                            line + " " +
                            SRC_COMMENT_LEAD_RE.sub("", lines[i + 1]))
                    for text in windows:
                        keys = [(m.start(), m.group(1))
                                for m in key_re.finditer(text)]
                        for e in _line_bench_errors(
                                text, keys, bench,
                                f"{rel}:{i + 1} (doc comment)"):
                            if e not in seen:
                                seen.add(e)
                                errs.append(e)
    return errs


def src_stamp_of(rel_root):
    """MD5 over a tree (repo-relative path string + bytes, every regular
    *.scala file, sorted by path) — byte-identical to graft.SrcStamp
    .stampOf, the Scala side all stamp-carrying artifacts use. The
    fixture self-test below is what keeps the two implementations
    provably in lockstep."""
    import hashlib
    md = hashlib.md5()
    root = os.path.join(ROOT, rel_root)
    if not os.path.isdir(root):
        return "nosrc"
    files = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(".scala"):
                p = os.path.join(dirpath, n)
                # mirror the Scala side's Files.isRegularFile guard: a
                # directory or dangling symlink named *.scala must not
                # diverge (or crash) this implementation
                if not os.path.isfile(p):
                    continue
                files.append(os.path.relpath(p, ROOT))
    for rel in sorted(files):
        md.update(rel.encode("utf-8"))
        with open(os.path.join(ROOT, rel), "rb") as f:
            md.update(f.read())
    return md.hexdigest()


def current_src_stamp():
    """The artifact-facing stamp: src/main/scala, same as Bench.srcStamp /
    PlanCheck.srcStamp / QuantLadder.srcStamp."""
    return src_stamp_of("src/main/scala")


def check_stamp_mirror():
    """Mirror-drift self-test: this file carries the one sanctioned Python
    mirror of graft.SrcStamp, and before this check a drift between the
    two surfaced only as a confusing 'stale artifact' stamp-mismatch.
    Both implementations hash the committed tools/stamp_fixture/ tree;
    tools/stamp_fixture.expected pins the agreed digest (SrcStampSpec
    asserts the Scala side against the same file). A mismatch HERE is by
    construction a walk/filter/digest divergence in THIS mirror — named
    as such, checked before any stamp-based staleness verdict."""
    fx_rel = "tools/stamp_fixture"
    exp_path = os.path.join(ROOT, fx_rel + ".expected")
    if not (os.path.isdir(os.path.join(ROOT, fx_rel))
            and os.path.exists(exp_path)):
        return []  # fixture not present (pre-round-16 tree): nothing to pin
    expected = open(exp_path).read().split()[0].strip()
    got = src_stamp_of(fx_rel)
    if got != expected:
        return [
            f"SrcStamp MIRROR DRIFT: the Python mirror computes {got[:12]}… "
            f"over {fx_rel}/ but the committed Scala-agreed digest is "
            f"{expected[:12]}… ({fx_rel}.expected) — claims_check's walk no "
            "longer matches graft.SrcStamp; fix the mirror before trusting "
            "any stale-artifact verdict below"]
    return []


def check_generated_stamps():
    """Generated-at-HEAD gate: PLANCHECK.json and QUANT_LADDER.md each
    carry the src_stamp of the code state they were generated from; a
    stale stamp means the committed plan contracts / recall-floor table
    describe some OTHER code than HEAD — regenerate, don't narrate."""
    errs = []
    cur = current_src_stamp()
    pc = os.path.join(ROOT, "PLANCHECK.json")
    if os.path.exists(pc):
        try:
            stamp = json.load(open(pc)).get("src_stamp", "")
        except Exception:
            stamp = ""
        if stamp != cur:
            errs.append(
                f"PLANCHECK.json src_stamp {stamp[:12]}… != HEAD {cur[:12]}… — "
                "regenerate: sbt 'Test/runMain graft.plancheck.PlanCheck'")
    ql = os.path.join(ROOT, "QUANT_LADDER.md")
    if os.path.exists(ql):
        m = re.search(r"^src_stamp:\s*([0-9a-f]{32})\s*$",
                      open(ql).read(), re.M)
        # a ladder with no stamp line predates the gate — require the
        # stamp once the generator emits it (round 14+)
        if not m or m.group(1) != cur:
            got = m.group(1)[:12] + "…" if m else "missing"
            errs.append(
                f"QUANT_LADDER.md src_stamp {got} != HEAD {cur[:12]}… — "
                "regenerate: sbt 'runMain graft.sim.QuantLadder'")
    return errs


def check_doc(doc, total, n_pass, n_rows_only, n_fail, red_queries,
              graded_round):
    errs = []
    path = os.path.join(ROOT, doc)
    if not os.path.exists(path):
        return errs
    text = open(path).read()
    for lineno, line in enumerate(text.splitlines(), 1):
        for m in ARTIFACT_CITE_RE.finditer(line):
            if int(m.group(1)) < graded_round and HISTORY_MARK not in line:
                errs.append(
                    f"{doc}:{lineno} cites stale {m.group(0)} but the graded "
                    f"artifact is CORRECTNESS_r{graded_round:02d}.json — refresh "
                    f"the prose or mark the line '(historical)'")
        for m in CLAIM_RE.finditer(line):
            c_oracle, c_rows_only = int(m.group(1)), int(m.group(2))
            if (c_oracle, c_rows_only) != (n_pass, n_rows_only):
                errs.append(
                    f"{doc}:{lineno} claims '{m.group(0)}' but artifact has "
                    f"{n_pass} oracle + {n_rows_only} rows-only")
        if PERFECTION_RE.search(line) and n_fail > 0:
            errs.append(
                f"{doc}:{lineno} claims every oracle query hash-matches but "
                f"artifact has {n_fail} failing row(s)")
        named = [q for q in QUERY_NAME_RE.findall(line) if q in red_queries]
        if named and STATUS_CLAIM_RE.search(line) \
                and not NEGATION_RE.search(line):
            errs.append(
                f"{doc}:{lineno} calls {'/'.join(sorted(set(named)))} "
                f"fixed/green but the artifact row is red: '{line.strip()[:120]}'")
    return errs


def main():
    if len(sys.argv) > 1:
        art = sys.argv[1]
    else:
        arts = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
        if not arts:
            print("claims_check: no CORRECTNESS_r*.json found", file=sys.stderr)
            sys.exit(2)
        art = arts[-1]
    total, n_pass, n_rows_only, n_fail, fails, red_queries = artifact_counts(art)
    print(f"artifact {os.path.basename(art)}: total={total} oracle-pass={n_pass} "
          f"rows-only={n_rows_only} fail={n_fail}")
    for f in fails:
        print(f"  FAILING ROW  {f}")
    # stale citations are judged against the round of the artifact being
    # CHECKED (an explicitly-passed replay summary has no round → fall
    # back to the newest round in the tree, which is then also `art`)
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(art))
    if m:
        graded_round = int(m.group(1))
    else:
        rounds = [int(g.group(1)) for p in glob.glob(
                      os.path.join(ROOT, "CORRECTNESS_r*.json"))
                  for g in [re.search(r"CORRECTNESS_r(\d+)\.json$", p)] if g]
        graded_round = max(rounds) if rounds else 0
    errs = []
    bench = bench_local_queries()
    for doc in ("COVERAGE.md", "README.md"):
        errs.extend(check_doc(doc, total, n_pass, n_rows_only, n_fail,
                              red_queries, graded_round))
        errs.extend(check_bench_claims(doc, bench))
    errs.extend(check_src_comment_bench_claims(bench))
    # mirror self-test FIRST in the stamp family: a drifted mirror would
    # make the generated-stamp verdicts below read as false staleness
    errs.extend(check_stamp_mirror())
    errs.extend(check_generated_stamps())
    if errs:
        for e in errs:
            print(f"CLAIM-MISMATCH  {e}")
        sys.exit(1)
    print("claims_check: all prose count claims consistent with the artifact")
    sys.exit(0)


if __name__ == "__main__":
    main()
