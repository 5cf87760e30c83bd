#!/usr/bin/env python3
"""Generate docs/OPERATORS.md — the grouped API index for graft.ops.

One line per public operator: name, the first sentence of its scaladoc
(the contract), the driver gates that execute it, and its scale posture
(the scaladoc's "Scale posture:" lead when present).

Like tools/gate_counts.py, this DERIVES documentation from the source of
truth instead of hand-maintaining it: the scaladoc is the contract, the
gate bodies in src/main/scala/graft/queries/*.scala are the verification
map. Re-run after adding operators:

    python3 tools/operator_index.py > docs/OPERATORS.md
"""
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OPS = REPO / "src/main/scala/graft/ops"
QUERIES = REPO / "src/main/scala/graft/queries"

# module -> one-line group description (shown as the section lead)
GROUPS = {
    "Dedup": "Exact, near-duplicate, segment/span and cross-corpus deduplication",
    "Similarity": "Embedding similarity: brute-force/LSH/IVF ANN, semantic dedup, pooling",
    "TextFunctions": "Per-row text signals: cleaning, quality, lang-id, fingerprints, HTML, scripts",
    "Sampling": "Deterministic sampling, mixing, quantiles, budgets, rank transforms",
    "Packing": "Sequence packing, sharding, global shuffle, training-order layout",
    "Chunking": "Word-window chunking for RAG / training sequences",
    "Decontaminate": "Train/eval decontamination (n-gram and semantic)",
    "Bpe": "Trained BPE tokenizer (merge learning + canonical encode)",
    "Unigram": "Unigram-LM (SentencePiece-style) tokenizer: EM training + Viterbi encode",
    "NgramLm": "Bigram language-model fluency scoring and perplexity buckets",
    "TfIdf": "TF-IDF scoring and keyword extraction",
    "Vocab": "Frequency-ranked vocabulary, PMI collocations, OOV reporting",
    "Bm25": "BM25 retrieval scoring",
    "Dsir": "DSIR importance-weighted data selection",
    "HashedClassifier": "Hashed linear classifier inference (broadcast model)",
    "HeavyHitters": "Misra-Gries heavy hitters (bounded-memory sketch)",
    "CountMin": "Count-Min sketch frequency estimation",
    "Quantize": "int8 quantization and quantized/MIPS top-k",
    "Pq": "Product quantization: codebook training, encoding, ADC top-k",
    "IvfInt": "Integer-exact IVF: quantized k-means training and probing",
    "Pca": "PCA fit/project for embedding reduction",
    "Outliers": "Embedding outlier removal (centroid distance)",
    "AnnEval": "ANN recall@k evaluation",
    "RankFusion": "Reciprocal-rank fusion of ranked lists",
    "BloomJoin": "Bloom-prefiltered exact anti/semi joins",
    "SkewJoin": "Salted joins and skew diagnosis",
    "AsOfJoin": "As-of (nearest-past) joins",
    "RangeJoin": "Bucketed range/interval joins",
    "PageRank": "Integer-exact PageRank (with dangling-mass redistribution)",
    "ConnectedComponents": "Star-contraction connected components (O(log n) rounds)",
    "Urls": "URL canonicalization, domains, outlinks, robots filters, fetch slots",
    "CorpusStats": "Corpus composition, drift, and length-histogram reports",
    "JsonIngest": "JSONL ingest with quarantine contract",
    "Multimodal": "Opaque-binary media columns: real JDK image (ImageIO) and audio (javax.sound) decode, frame sampling; MP4/WebM container metadata walks (codec-level video decode stubbed)",
    "Warc": "WARC (ISO 28500) web-archive ingest: record walk, gzip members, HTTP block split, bomb-capped decompression",
    "Formats": "Interchange-format (ORC/CSV/JSON) round-trips with pinned fidelity options",
    "Scd": "SCD-2 dimension history and CDC latest-wins snapshots from per-key changelogs",
    "DataQuality": "Deequ-style constraint reports: predicates, uniqueness, referential integrity",
    "Intervals": "Interval-union coverage (gaps and islands) per key",
    "ZOrder": "Z-order (Morton) layout for multi-column locality",
    "Par": "Cache bookkeeping for iterative operators (fan-in helper, tracked persists)",
}

DOC_RE = re.compile(r"/\*\*(.*?)\*/", re.DOTALL)


def first_sentence(doc: str) -> str:
    text = " ".join(
        ln.strip().lstrip("*").strip() for ln in doc.strip().splitlines())
    text = re.sub(r"\[\[([^\]]+)\]\]", r"`\1`", text)
    text = re.sub(r"\s+", " ", text).strip()
    # first sentence: the first period followed by a space+capital/backtick
    # or end; guarded against "e.g." / "et al." / decimals
    m = re.search(r"(?<!e\.g)(?<!et al)(?<!i\.e)\.(?:\s+(?=[A-Z`(])|$)", text)
    out = text[: m.end()].strip() if m else text
    return out if len(out) <= 360 else out[:357] + "..."


def scale_posture(doc: str) -> str:
    text = " ".join(
        ln.strip().lstrip("*").strip() for ln in doc.strip().splitlines())
    text = re.sub(r"\[\[([^\]]+)\]\]", r"`\1`", text)
    text = re.sub(r"\s+", " ", text)
    m = re.search(r"Scale posture:\s*(.+?)(?:\.\s+[A-Z`]|$)", text)
    if not m:
        return ""
    out = m.group(1).strip().rstrip(".")
    return out if len(out) <= 300 else out[:297] + "..."


def parse_ops(path: Path):
    """Yield (object, def, line, first_sentence, posture) for public defs."""
    src = path.read_text()
    obj_m = re.search(r"^object (\w+)", src, re.MULTILINE)
    if not obj_m:
        return
    obj = obj_m.group(1)
    for m in re.finditer(
            r"/\*\*((?:[^*]|\*(?!/))*)\*/\s*\n(\s*)def (\w+)", src,
            re.DOTALL):
        doc, indent, name = m.group(1), m.group(2), m.group(3)
        # public top-level members only (indent 2, no private/private[ops])
        decl_start = src.rfind("\n", 0, m.start(0))
        if len(indent.replace("\n", "")) != 2:
            continue
        tail = src[m.end(1):m.start(3)]
        if "private" in tail:
            continue
        line = src[: m.start(3)].count("\n") + 1
        yield obj, name, line, first_sentence(doc), scale_posture(doc)


def gate_map():
    """gate name -> set of 'Object.method' references in its body."""
    gates = {}
    call_re = re.compile(r"\b([A-Z]\w+)\.(\w+)\(")
    for qf in sorted(QUERIES.glob("*.scala")):
        src = qf.read_text()
        for m in re.finditer(r'"([a-z0-9_]+)" -> \{ \(s, dir\) =>', src):
            gate = m.group(1)
            # body = balanced-brace span from the '{' before '(s, dir)'
            start = src.rindex("{", 0, m.end())
            depth, i = 0, start
            while i < len(src):
                c = src[i]
                if c == "{":
                    depth += 1
                elif c == "}":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            body = src[start:i]
            refs = {f"{o}.{f}" for o, f in call_re.findall(body)}
            gates.setdefault(gate, set()).update(refs)
    inv = {}
    for gate, refs in gates.items():
        for ref in refs:
            inv.setdefault(ref, []).append(gate)
    return inv


def main():
    inv = gate_map()
    rows_by_obj = {}
    for f in sorted(OPS.glob("*.scala")):
        for obj, name, line, sent, posture in parse_ops(f):
            rows_by_obj.setdefault(obj, []).append(
                (name, f.name, line, sent, posture,
                 sorted(inv.get(f"{obj}.{name}", []))))
    total = sum(len(v) for v in rows_by_obj.values())
    gated = sum(1 for v in rows_by_obj.values() for r in v if r[5])
    print("# graft operator index")
    print()
    print("<!-- GENERATED by tools/operator_index.py — do not edit by hand;")
    print("     re-run after adding operators. -->")
    print()
    print(f"{total} public operators across {len(rows_by_obj)} modules; "
          f"{gated} are executed directly by at least one driver gate "
          "(the rest are building blocks the gated entry points compose, "
          "or spec-verified utilities). Driver gates are the "
          "`SparkEntry.queries` entries hash-checked against DuckDB oracles "
          "every round; specs are ScalaTest. See SURVEY.md §2 for the "
          "capability-level inventory and §4/§5 for the correctness and "
          "scale methodology.")
    for obj in sorted(rows_by_obj, key=lambda o: (o not in GROUPS, o)):
        rows = rows_by_obj[obj]
        print()
        print(f"## `graft.ops.{obj}` — {GROUPS.get(obj, '')}")
        print()
        for name, fname, line, sent, posture, gates in sorted(rows):
            bits = [f"**`{name}`** ({fname}:{line}) — {sent}"]
            if gates:
                bits.append(f"  Gates: {', '.join('`%s`' % g for g in gates)}.")
            if posture:
                bits.append(f"  Scale: {posture}.")
            print("- " + "\n".join(bits))
    print()


if __name__ == "__main__":
    sys.stdout.reconfigure(encoding="utf-8")
    main()
