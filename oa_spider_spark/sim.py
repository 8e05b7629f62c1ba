"""Pure-Python reference simulator — the sequential `todo()`/`save_doc`
loop of the reference (`oa.py:438-460,215-221`), generalized to the same
frontier/budget semantics the Spark engine implements, over the SAME
deterministic synthetic universe (`datagen`).

This is the correctness oracle mandated by the north_rule: "matching the
reference's crawl ordering and URL-seen set under the same seed list +
politeness budget". It is single-threaded and imperative on purpose —
list-of-dicts, explicit sorts, sequential fetches — mirroring how the
reference's one thread walks docs-then-mails in listing order. The pytest
equivalence suite (tests/test_frontier.py) asserts per round:

  * identical fetch sequence (url_canon in fetch_order),
  * identical seen-set contents,
  * identical retry/dead-letter populations,
  * per-row payload invariants (PSNR/caption) between both decodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import datagen
from .config import DEFAULT_HOST_BUDGET, MAX_ATTEMPTS
from .hashing import url_hash64


def order_key(row: dict) -> tuple:
    """Total crawl order: priority desc, created desc, docs-then-mails,
    url_hash tiebreak (FIXTURES.md §2; reference O1-O4)."""
    return (
        -row["priority"],
        -row["created_ms"],
        0 if row["kind"] == "doc" else 1,
        row["url_hash"],
    )


def _norm(row: dict) -> dict:
    uc = datagen.canon_of(row["url"])
    out = dict(row)
    out["url_canon"] = uc
    out["url_hash"] = url_hash64(uc)
    out["host"] = uc.split("://", 1)[1].split("/", 1)[0]
    return out


@dataclass
class SimState:
    frontier: list[dict] = field(default_factory=list)
    seen: dict[int, str] = field(default_factory=dict)  # url_hash -> status
    fetched: list[dict] = field(default_factory=list)   # all rounds, in order


def seed_state(rows: list[dict]) -> SimState:
    st = SimState()
    for r in rows:
        n = _norm(r)
        n.setdefault("round_added", 0)
        st.frontier.append(n)
    return st


def run_round_sim(
    st: SimState,
    round_id: int,
    *,
    n_hosts: int = 20,
    default_budget: int = DEFAULT_HOST_BUDGET,
    round_limit: int | None = None,
    max_depth: int = 2,
    host_budgets: dict[str, int] | None = None,
    robots_disallow: dict[str, list[str]] | None = None,
    crawl_delays: dict[str, int] | None = None,
) -> list[dict]:
    """One sequential crawl round; returns fetch records in crawl order."""
    # dedup by url_hash, latest attempt wins (engine round.py:dedup_frontier)
    best: dict[int, dict] = {}
    for r in st.frontier:
        cur = best.get(r["url_hash"])
        key = (r["attempt"], r.get("round_added", 0), r["priority"])
        if cur is None or key > (cur["attempt"], cur.get("round_added", 0), cur["priority"]):
            best[r["url_hash"]] = r
    active = [r for r in best.values() if r["depth"] <= max_depth and r["url_hash"] not in st.seen]

    # robots gate
    if robots_disallow:
        def allowed(r):
            path = "/" + r["url_canon"].split("://", 1)[1].split("/", 1)[1]
            return not any(path.startswith(p) for p in robots_disallow.get(r["host"], []))
        active = [r for r in active if allowed(r)]

    # per-host budget under the total order, then global order + limit
    active.sort(key=order_key)
    taken, per_host = [], {}
    from .config import ROUND_PERIOD_MS

    for r in active:
        c = per_host.get(r["host"], 0)
        delay = (crawl_delays or {}).get(r["host"], 0)
        if delay > 0:
            # Crawl-delay caps the round budget (politeness.robots_allowed):
            # min(override, cap) with an override, else the cap itself
            cap = ROUND_PERIOD_MS // delay
            hb = (host_budgets or {}).get(r["host"])
            budget = cap if hb is None else min(hb, cap)
        else:
            budget = (host_budgets or {}).get(r["host"], default_budget)
        if c < budget:
            per_host[r["host"]] = c + 1
            taken.append(r)
    if round_limit is not None:
        taken = taken[:round_limit]

    # sequential fetch loop (reference: one doc at a time, oa.py:216-219)
    new_frontier: list[dict] = []
    records = []
    for i, r in enumerate(taken):
        res = datagen.fetch_url(r["url_canon"], attempt=r["attempt"], n_hosts=n_hosts)
        rec = dict(r)
        rec.update(
            fetch_order=i + 1, round=round_id, status=res.status, bytes=res.bytes,
            w=res.w, h=res.h, fmt=res.fmt, caption=res.caption, phash=res.phash,
            links=res.links, elapsed_ms=res.elapsed_ms, reason=res.reason,
        )
        records.append(rec)
        if res.status == "ok":
            st.seen[r["url_hash"]] = "ok"
            for link in res.links:
                lc = datagen.canon_of(link)
                if r["depth"] + 1 > max_depth:
                    continue
                new_frontier.append(
                    _norm(
                        dict(
                            url=link,
                            kind=lc.split("/")[3],
                            priority=datagen.link_priority(lc),
                            created_ms=datagen.link_created_ms(lc),
                            depth=r["depth"] + 1,
                            attempt=0,
                            round_added=round_id,
                        )
                    )
                )
        elif res.status == "failed":
            st.seen[r["url_hash"]] = "failed"
        elif res.status == "retry":
            if r["attempt"] + 1 < MAX_ATTEMPTS:
                nr = dict(r)
                nr["attempt"] = r["attempt"] + 1
                nr["round_added"] = round_id + 1
                new_frontier.append(nr)
            else:
                st.seen[r["url_hash"]] = "retry"

    # frontier carries over unselected rows + new discoveries/retries
    taken_hashes = {r["url_hash"] for r in taken}
    st.frontier = [r for r in st.frontier if r["url_hash"] not in taken_hashes]
    st.frontier.extend(new_frontier)
    st.fetched.extend(records)
    return records
