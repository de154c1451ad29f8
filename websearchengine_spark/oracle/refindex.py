"""Pure-Python oracle loader for the reference's shipped hw3 index.

Independently re-parses the same files as
``websearchengine_spark.sources.refindex`` (different code path: plain
string ops here, Catalyst column expressions there) into an
:class:`~websearchengine_spark.oracle.engine.OracleIndex`, so QL / BM25 /
phrase / comprehensive rankings computed by Spark over REAL reference data
can be asserted against the literal-oracle implementations.

Parse rule per IndexerInvertedCompressed.java readAll (:319-359): term =
text before the FIRST ':', data = text after the LAST ':'; ';'-groups are
[docid, pos...] with ABSOLUTE positions.  Doc metadata (real doc lengths
``totalTerms``, PageRank, NumViews) from the ``documents`` JSON array
(loadIndex :364-390); corpus sentinels from ``docURL`` (:146-147).
"""

from __future__ import annotations

import json
import os

from websearchengine_spark.oracle.engine import OracleIndex

REF_INDEX_DIR = "/root/reference/hw3/data/index"


def load_ref_index(index_dir: str = REF_INDEX_DIR) -> OracleIndex:
    idx = OracleIndex()
    names = sorted(n for n in os.listdir(index_dir) if n.endswith(".idx"))
    for name in names:
        with open(
            os.path.join(index_dir, name), encoding="utf-8", errors="replace"
        ) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if ":" not in line:
                    continue
                parts = line.split(":")
                term, data = parts[0], parts[-1]
                for grp in data.split(";"):
                    if not grp:
                        continue
                    nums = [int(x) for x in grp.split(",") if x]
                    if len(nums) > 1:
                        idx.postings[term].setdefault(nums[0], []).extend(
                            nums[1:]
                        )
    with open(os.path.join(index_dir, "documents"), encoding="utf-8") as fh:
        docs = json.load(fh)
    docs.sort(key=lambda d: d["docID"])
    idx.urls = [d["_url"] for d in docs]
    idx.doc_len = {d["docID"]: int(d["totalTerms"]) for d in docs}
    idx.page_rank = [float(d["_pageRank"]) for d in docs]
    idx.num_views = [int(d["_numViews"]) for d in docs]
    with open(os.path.join(index_dir, "docURL"), encoding="utf-8") as fh:
        m = json.load(fh)
    idx.num_docs = int(m["_numDocs"])
    idx.total_terms = int(m["_totalTermFrequency"])
    return idx
