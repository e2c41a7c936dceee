"""Model-based fuzz of the Engine surface: a seeded random program of
puts (plain / TTL'd / wildcard-topic / cross-contract), batches
(committed AND aborted), deletes, reopens and Gets is applied both to
the real Engine and to an independent pure-Python model of unitdb's
semantics (db.go:222-319 read pipeline: contract filter → symmetric
topic match → ?last cutoff → TTL liveness → newest-first top-K;
db.go:336-360 write path; tombstone visibility). The model re-derives
everything from scratch — including the wildcard matcher, shared with
tests/test_topic_matrix.py's independent formulation — so a bug in
core/topic.py or operators/get.py cannot hide in both places.

Golden tests pin one value each; this pins the COMPOSITION: TTL
expiring mid-program, a delete landing on a batch-written row, a
wildcard query over a wildcard write, a reopen between write and
read — interactions no fixture enumerates.
"""

from __future__ import annotations

import random

import pytest

from unitdb_spark.core.model import MASTER_CONTRACT, Entry, Query
from unitdb_spark.engine import Engine

T0 = 1_700_000_000.0

TOPIC_TOKENS = ("a", "b", "c", "dev", "x9", "*")
CONTRACTS = (MASTER_CONTRACT, 1042)


def _rand_pattern(rng: random.Random) -> str:
    n = rng.randint(1, 4)
    body = [rng.choice(TOPIC_TOKENS) for _ in range(n)]
    tail = rng.random() < 0.25
    s = ".".join(body)
    return s + "..." if tail else s


def _tokens(p: str) -> list[str]:
    tail = p.endswith("...")
    body = p[:-3] if tail else p
    return (body.split(".") if body else []) + (["..."] if tail else [])


def _one_way(pat: list[str], conc: list[str]) -> bool:
    if pat and pat[-1] == "...":
        base = pat[:-1]
        return len(conc) >= len(base) and all(
            x == "*" or x == y for x, y in zip(base, conc)
        )
    return len(pat) == len(conc) and all(
        x == "*" or x == y for x, y in zip(pat, conc)
    )


def _match(stored: str, query: str) -> bool:
    s, q = _tokens(stored), _tokens(query)
    return _one_way(s, q) or _one_way(q, s)


class Model:
    """Pure-Python unitdb semantics."""

    def __init__(self) -> None:
        self.rows: list[dict] = []  # seq, contract, topic, ts, expires, payload
        self.deleted: set[int] = set()

    def put(self, seq, topic, payload, contract, ts, ttl):
        self.rows.append(
            {
                "seq": seq,
                "topic": topic.split("?")[0],
                "payload": payload,
                "contract": contract,
                "ts": ts,
                "expires": (ts + ttl) if ttl is not None else None,
            }
        )

    def get(self, pattern, contract, now, last, limit):
        live = [
            r
            for r in self.rows
            if r["seq"] not in self.deleted
            and r["contract"] == contract
            and (r["expires"] is None or r["expires"] > now)
            and (last is None or r["ts"] >= now - last)
            and _match(r["topic"], pattern)
        ]
        live.sort(key=lambda r: -r["seq"])
        return [r["payload"] for r in live[:limit]]

    def count(self, now):
        return sum(
            1
            for r in self.rows
            if r["seq"] not in self.deleted
            and (r["expires"] is None or r["expires"] > now)
        )


def _run_program(spark, tmp_path, seed: int, n_ops: int = 45) -> None:
    rng = random.Random(seed)
    path = str(tmp_path / f"fuzz{seed}")
    eng = Engine.open(spark, path)
    model = Model()
    t = T0
    try:
        for i in range(n_ops):
            t += 10.0
            op = rng.random()
            if op < 0.40:  # single put (maybe TTL, maybe wildcard topic)
                topic = _rand_pattern(rng)
                ttl = rng.choice([None, None, 30, 120, 1000])
                contract = rng.choice(CONTRACTS)
                raw = topic + (f"?ttl={ttl}s" if ttl is not None else "")
                payload = f"p{i}".encode()
                seq = eng.put_entry(
                    Entry(raw, payload).with_contract(contract), ts=t
                )
                model.put(seq, topic, payload, contract, t, ttl)
            elif op < 0.55:  # committed batch (atomic multi-put)
                staged = []
                with eng.batch() as b:
                    for j in range(rng.randint(2, 4)):
                        topic = _rand_pattern(rng)
                        contract = rng.choice(CONTRACTS)
                        payload = f"b{i}_{j}".encode()
                        b.put_entry(
                            Entry(topic, payload).with_contract(contract),
                            ts=t,
                        )
                        staged.append((topic, payload, contract))
                # seqs are assigned at stage time, in order; recover them
                # from the committed store via count of prior rows
                base_seq = max(
                    (r["seq"] for r in model.rows), default=0
                )
                for k, (topic, payload, contract) in enumerate(staged):
                    model.put(base_seq + 1 + k, topic, payload, contract, t, None)
            elif op < 0.62:  # aborted batch — model unchanged
                with pytest.raises(RuntimeError):
                    with eng.batch() as b:
                        b.put(_rand_pattern(rng), f"x{i}".encode())
                        raise RuntimeError("abort")
            elif op < 0.75:  # delete a random live seq
                live = [r["seq"] for r in model.rows if r["seq"] not in model.deleted]
                if live:
                    seq = rng.choice(live)
                    eng.delete(seq)
                    model.deleted.add(seq)
            elif op < 0.80:  # reopen (persistence across close)
                eng.close()
                eng = Engine.open(spark, path)
            else:  # get + compare
                pattern = _rand_pattern(rng)
                contract = rng.choice(CONTRACTS)
                last = rng.choice([None, None, 35.0, 100.0, 500.0])
                limit = rng.choice([0, 3, 10])  # 0 -> default 1000
                q = Query(
                    topic=pattern, contract=contract,
                    limit=limit, last=last,
                )
                now = t + rng.choice([1.0, 25.0, 200.0])
                got = eng.get(q, now=now)
                want = model.get(
                    pattern, contract, now, last, limit if limit else 1000
                )
                assert got == want, (
                    f"seed={seed} op={i} pattern={pattern!r} "
                    f"contract={contract} last={last} now-t0={now - T0}"
                )
        # final sweeps: full-store count + a catch-all query per contract
        now = t + 1.0
        assert eng.count(now=now) == model.count(now)
        for contract in CONTRACTS:
            got = eng.get(Query(topic="...", contract=contract), now=now)
            want = model.get("...", contract, now, None, 1000)
            assert got == want, f"seed={seed} final sweep contract={contract}"
    finally:
        eng.destroy()


class TestEngineFuzz:
    @pytest.mark.parametrize("seed", [7, 23])
    def test_random_program_matches_model(self, spark, tmp_path, seed):
        _run_program(spark, tmp_path, seed)
