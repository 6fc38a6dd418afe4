"""Predict (and verify) the driver's 50-query correctness-gate slice.

The driver gates a 50-row budget per round over ``queries()`` order;
``__spark_entry__._ordered_names`` fronts oracle-new queries and
rotates the re-check block with a seed derived from how many
CORRECTNESS_r*.json files exist.  That seed convention is load-bearing
but fragile if the driver ever skips or renames an artifact (r02 is
already missing from the series), so each round we RECORD the
predicted slice here and CHECK the next round's actual slice against
the prior prediction (r11 VERDICT item 7).

Usage:
  python tools/predict_gate.py              # print the predicted slice
  python tools/predict_gate.py CORRECTNESS_r12.json
      # compare a landed driver artifact against the prediction the
      # same repo state produces (run BEFORE adding new queries or
      # touching _DRIVER_CHECKED, or from the round's closing commit)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BUDGET = 50


def predicted_slice() -> list[str]:
    import __spark_entry__ as e

    reg = e._registry()
    return e._ordered_names(reg)[:BUDGET]


def main() -> int:
    pred = predicted_slice()
    if len(sys.argv) < 2:
        print(json.dumps({"rotation_files": len(list(REPO.glob("CORRECTNESS_r*.json"))),
                          "predicted": pred}))
        return 0
    actual = list(json.loads(Path(sys.argv[1]).read_text()).keys())
    ok = pred == actual
    only_pred = [n for n in pred if n not in actual]
    only_act = [n for n in actual if n not in pred]
    print(json.dumps({"match": ok, "n_predicted": len(pred),
                      "n_actual": len(actual),
                      "only_in_prediction": only_pred,
                      "only_in_actual": only_act}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
