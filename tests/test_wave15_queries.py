"""Invariant test for wave-15 dialogue flattening: the Spark result
must equal an independent Python replay (ordering, role parity,
fingerprints)."""

from __future__ import annotations

import hashlib
import math


def test_sft_dialogue_flatten_replay(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave15_queries import (
        sft_dialogue_flatten,
    )

    rows = sft_dialogue_flatten(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    dialogues: dict[tuple[int, object], list] = {}
    for x in ev:
        day = x.ts.date()
        v = 0.0 if x.value is None else float(x.value)
        turn = f"{x.event_type}:{int(math.floor(v * 100))}"
        dialogues.setdefault((x.user_id, day), []).append(
            (x.ts, x.event_id, turn)
        )
    got = {(r.user_id, r.day): r for r in rows}
    assert set(got) == set(dialogues)
    for key, turns in dialogues.items():
        turns.sort(key=lambda t: (t[0], t[1]))
        r = got[key]
        assert r.n_turns == len(turns)
        text = "|".join(t[2] for t in turns)
        assert r.dialogue_fp == hashlib.md5(text.encode()).hexdigest()
        assistant = [t[2] for i, t in enumerate(turns) if (i + 1) % 2 == 0]
        assert r.assistant_turns == len(assistant)
        assert r.assistant_chars == sum(len(t) for t in assistant)
