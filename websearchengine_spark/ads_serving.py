"""S10 ads routes — file-backed auction state + serve-time CTR fold.

The reference's QueryHandler keeps the ads subsystem's mutable state in
JSON sidecars under ``data/ads/`` and serves four route families
(QueryHandler.java):

- ``/ads/create`` (:297-313) appends ``company_ad \\t title \\t body`` to
  ``advertisement.tsv``;
- ``/ads/bid`` (:314-325 + queryToMap :197-263) records a bid
  ``word -> {company: ad_id \\t price}`` in ``ad.json`` and initializes
  the ad's CTR entry at the company's mean recorded CTR (substring match
  on the company name) else the 0.1 prior, flags ``+F+F``;
- ``/search`` (:479-545) runs the AdsRanker auction, logs the session
  (``log.json``), and marks a VIEW flag on every served ad whose bid
  word appears in the query;
- ``/search/ads`` (:353-408) is the click callback: it appends the
  clicked title to the session log and sets the CLICK flag true for the
  clicked ad / false for the rest, for every bid word in the query.
  AdsRanker.getCTR (:345-377) then applies ``ctr ± ctr/10`` (clamped to
  1.0) at the NEXT query for every viewed entry.

This module re-expresses that machine Spark-first: the auction itself is
the existing batch operator (``operators.ads.rank_ads`` — dimension-scale
broadcast joins), and the mutable state is the same three sidecars in
honest JSON plus an append-only ``impressions.jsonl`` event log so the
serve-time CTR state is replayable by the batch ``ctr_fold`` oracle.

One DOCUMENTED deviation: the reference leaves the view flag sticky
after folding (getCTR writes the new ctr but keeps ``+T``), so every
subsequent query re-applies the ±10% update for the same impression — a
compounding bug that makes the serve state unreproducible by any batch
replay.  Here a fold consumes the impression (flags reset to F) so each
impression updates CTR exactly once, which is AdsRanker's evident intent
and what ``ctr_fold``'s ordered replay models; the resolved impression
is appended to ``impressions.jsonl`` at fold time, so at any moment
``ctr_fold(impressions, prior)`` reproduces the live state exactly
(asserted by tests/test_cli.py::test_http_ads_click_roundtrip).
"""

from __future__ import annotations

import json
import os
import uuid

DEFAULT_PRIOR = 0.1


class AdsState:
    """File-backed ads auction state for one serve deployment.

    ``ads_dir`` holds: ``advertisement.tsv`` (corpus; seeded from the
    shipped reference file unless present), ``bids.json``
    (``{word: {company: [ad_id, price]}}`` — the reference's ad.json
    shape, including the company-overwrite quirk: one bid per company
    per word, latest wins), ``ctr.json``
    (``{word: {ad_key: {ctr, view, click}}}`` — the reference's
    ``"ctr+V+C"`` triple as structured JSON), ``sessions.jsonl`` and
    ``impressions.jsonl`` (append-only logs)."""

    def __init__(self, spark, ads_dir: str, seed_tsv: str | None = None):
        from websearchengine_spark.operators import ads as A

        self.spark = spark
        self.dir = ads_dir
        os.makedirs(ads_dir, exist_ok=True)
        self.tsv = os.path.join(ads_dir, "advertisement.tsv")
        if not os.path.exists(self.tsv):
            src = seed_tsv if seed_tsv is not None else A.ADS_TSV
            with open(src, encoding="utf-8") as f:
                data = f.read()
            with open(self.tsv, "w", encoding="utf-8") as f:
                f.write(data)
        self._bids_path = os.path.join(ads_dir, "bids.json")
        self._ctr_path = os.path.join(ads_dir, "ctr.json")
        self._sessions_path = os.path.join(ads_dir, "sessions.jsonl")
        self._impressions_path = os.path.join(ads_dir, "impressions.jsonl")
        self.bids = self._load(self._bids_path)
        self.ctr = self._load(self._ctr_path)
        self._seq = 0
        self._tables = None  # (mtime, (ads, postings, title_tf))

    # -- state io ----------------------------------------------------------

    @staticmethod
    def _load(path: str) -> dict:
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                return json.load(f)
        return {}

    def _save(self) -> None:
        for path, obj in (
            (self._bids_path, self.bids),
            (self._ctr_path, self.ctr),
        ):
            with open(path, "w", encoding="utf-8") as f:
                json.dump(obj, f, indent=1, sort_keys=True)

    def _append(self, path: str, row: dict) -> None:
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")

    # -- routes ------------------------------------------------------------

    def create_ad(self, company: str, ad_id: str, title: str,
                  body: str) -> str:
        """/ads/create — append to the TSV corpus
        (QueryHandler.java:297-313)."""
        key = f"{company}_{ad_id}"
        with open(self.tsv, "a", encoding="utf-8") as f:
            f.write(f"{key}\t{title}\t{body}\n")
        self._tables = None
        return key

    def place_bid(self, word: str, company: str, ad_id: str,
                  price: float) -> str:
        """/ads/bid — record the bid and initialize the ad's CTR entry at
        the company-mean prior (queryToMap, QueryHandler.java:197-263:
        the mean runs over every recorded entry whose ad_key CONTAINS
        the company name, across all words) else 0.1, flags F+F."""
        self.bids.setdefault(word, {})[company] = [ad_id, float(price)]
        key = f"{company}_{ad_id}"
        vals = [
            e["ctr"]
            for per_word in self.ctr.values()
            for ad_key, e in per_word.items()
            if company in ad_key
        ]
        prior = sum(vals) / len(vals) if vals else DEFAULT_PRIOR
        self.ctr.setdefault(word, {})[key] = {
            "ctr": prior, "view": False, "click": False,
        }
        self._save()
        return key

    def _fold_pending(self) -> None:
        """Consume every viewed impression: ``ctr ± ctr/10`` by the click
        flag, clamped to 1.0 (AdsRanker.getCTR:345-377), then reset the
        flags and append the resolved impression to the replay log (see
        the module docstring for the sticky-flag deviation)."""
        for word, per_word in sorted(self.ctr.items()):
            for key, e in sorted(per_word.items()):
                if not e["view"]:
                    continue
                c = e["ctr"]
                c = c + c / 10 if e["click"] else c - c / 10
                e["ctr"] = min(1.0, c)
                self._append(
                    self._impressions_path,
                    {"ts": self._seq, "event_id": self._seq,
                     "keyword": word, "ad_key": key,
                     "clicked": e["click"]},
                )
                self._seq += 1
                e["view"] = False
                e["click"] = False

    def _ads_tables(self):
        from websearchengine_spark.operators import ads as A

        mtime = os.path.getmtime(self.tsv)
        if self._tables is None or self._tables[0] != mtime:
            self._tables = (mtime, A.ads_tables_from_tsv(self.spark, self.tsv))
        return self._tables[1]

    def _frames(self):
        """Current bids/ctr state as the broadcastable DataFrames
        rank_ads consumes."""
        bid_rows = [
            (w, company, ad_id, float(price))
            for w, per in self.bids.items()
            for company, (ad_id, price) in per.items()
        ]
        ctr_rows = [
            (w, key, float(e["ctr"]))
            for w, per in self.ctr.items()
            for key, e in per.items()
        ]
        bids = self.spark.createDataFrame(
            bid_rows or [("", "", "", 0.0)],
            "keyword string, company string, ad_id string, price double",
        )
        ctr = self.spark.createDataFrame(
            ctr_rows or [("", "", 0.0)],
            "keyword string, ad_key string, ctr double",
        )
        return bids, ctr

    def search(self, query: str, num: int = 3):
        """/search ads half — fold pending impressions, run the auction,
        log the session, mark views on served ads whose bid word occurs
        in the query (substring containment, exactly the reference's
        ``query.indexOf(key)`` at QueryHandler.java:532).  Returns
        (session_id, [(ad_key, title, score)])."""
        from pyspark.sql import functions as F

        from websearchengine_spark.operators import ads as A

        self._fold_pending()
        self._save()
        ads_df, postings, title_tf = self._ads_tables()
        bids, ctr = self._frames()
        ranked = A.rank_ads(ads_df, postings, title_tf, bids, ctr, query,
                            k=num)
        out = ranked.join(
            F.broadcast(ads_df.select("ad_key", "title")), "ad_key", "left"
        ).orderBy(F.desc("score"), F.asc("ad_key")).collect()
        results = [
            (r.ad_key, r.title or "", float(r.score)) for r in out
        ]
        session_id = str(uuid.uuid4())
        self._append(
            self._sessions_path,
            {"session_id": session_id, "query": query,
             "ads": [k for k, _, _ in results]},
        )
        served = {k for k, _, _ in results}
        for word, per_word in self.ctr.items():
            if word in query:
                for key, e in per_word.items():
                    if key in served:
                        e["view"] = True
        self._save()
        return session_id, results

    def click(self, session_id: str, company_ads: str, query: str) -> None:
        """/search/ads — the click callback: log it, then for every bid
        word in the query set click=T on the clicked ad and click=F on
        the others (QueryHandler.java:353-408)."""
        self._append(
            self._sessions_path,
            {"session_id": session_id, "click": company_ads,
             "query": query},
        )
        for word, per_word in self.ctr.items():
            if word in query:
                for key, e in per_word.items():
                    e["click"] = key == company_ads
        self._save()
