"""Benchmark report artifacts with the reference's exact schema.

Reproduces ``generate_csv_results`` (reference ``recognizer_test.py:437-513``):

- a per-trial CSV with columns file_name_played, file_name_result,
  song_start_time, correct, fingerprint_times, query_time, align_time,
  total_time, final_results;
- the hand-rolled pandas crosstab confusion matrix (``CM_`` prefix);
- sklearn confusion_matrix / classification_report / accuracy_score dumps
  (``CMSK_`` / ``CRSK_`` / ``ASSK_`` prefixes);
- the same file-naming scheme encoding date, record count, clip seconds,
  SNR and checkpoint position (``recognizer_test.py:479-481``).
"""

from __future__ import annotations

import csv
import datetime
import os
from typing import Dict, List, Optional, Sequence

CSV_COLUMNS = [
    "file_name_played", "file_name_result", "song_start_time", "correct",
    "fingerprint_times", "query_time", "align_time", "total_time",
    "final_results",
]


def _csv_name(n_records: int, record_seconds: float, snr: Optional[float],
              iteration: int, now: Optional[datetime.datetime] = None) -> str:
    stamp = (now or datetime.datetime.now()).strftime("%d-%m-%Y_%H-%M-%S")
    base = f"shazam_results_{stamp}_{n_records}records_{record_seconds:g}seconds"
    if snr is not None:
        base += f"_{snr:g}SNR"
    return f"{base}_atSong{iteration + 1}.csv"


def generate_csv_results(
    songs_played: Sequence[str],
    predicted_names: Sequence[str],
    trial_times: Sequence[Dict],
    final_results_strs: Sequence[str],
    iteration: int,
    out_dir: str = ".",
    record_seconds: float = 5.0,
    snr: Optional[float] = None,
    now: Optional[datetime.datetime] = None,
) -> Dict[str, str]:
    """Write the four artifact files; returns {kind: path}.

    Ground truth is by filename, exactly like the reference
    (``recognizer_test.py:456``): predicted name string-compared to the
    played file's extensionless basename.
    """
    import pandas as pd
    from sklearn.metrics import (
        accuracy_score,
        classification_report,
        confusion_matrix,
    )

    os.makedirs(out_dir, exist_ok=True)
    true_names = [
        os.path.splitext(os.path.basename(p))[0] for p in songs_played
    ]

    rows = []
    for i, played in enumerate(songs_played):
        rows.append({
            "file_name_played": str(played),
            "file_name_result": str(predicted_names[i]),
            "song_start_time": trial_times[i]["song_start_time"],
            "correct": 1 if true_names[i] == predicted_names[i] else 0,
            "fingerprint_times": trial_times[i]["fingerprint_times"],
            "query_time": trial_times[i]["query_time"],
            "align_time": trial_times[i]["align_time"],
            "total_time": trial_times[i]["total_time"],
            "final_results": final_results_strs[i],
        })

    name = _csv_name(len(songs_played), record_seconds, snr, iteration, now)
    paths = {"results": os.path.join(out_dir, name)}
    with open(paths["results"], "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=CSV_COLUMNS)
        writer.writeheader()
        writer.writerows(rows)

    # hand-rolled crosstab CM (reference builds crosstab(y_true, y_true)
    # then flips mispredicted cells, recognizer_test.py:492-500)
    y_true = pd.Series(true_names, name="Actual")
    y_pred = pd.Series(list(predicted_names))
    cm_df = pd.crosstab(y_true, y_true)
    for i in range(len(y_true)):
        if y_true[i] != y_pred[i]:
            cm_df.at[y_true[i], y_true[i]] = 0
            if y_pred[i] not in cm_df.columns:
                cm_df[y_pred[i]] = 0
            cm_df.at[y_true[i], y_pred[i]] = 1
    paths["cm"] = os.path.join(out_dir, "CM_" + name)
    cm_df.to_csv(paths["cm"])

    # sklearn artifacts
    cm = confusion_matrix(true_names, list(predicted_names))
    cr = classification_report(
        true_names, list(predicted_names), output_dict=True, zero_division=0
    )
    acc = accuracy_score(true_names, list(predicted_names))
    paths["cmsk"] = os.path.join(out_dir, "CMSK_" + name)
    pd.DataFrame(cm).to_csv(paths["cmsk"])
    paths["crsk"] = os.path.join(out_dir, "CRSK_" + name)
    pd.DataFrame(cr).transpose().to_csv(paths["crsk"])
    paths["assk"] = os.path.join(out_dir, "ASSK_" + name)
    pd.DataFrame([acc]).to_csv(paths["assk"])
    paths["accuracy"] = str(acc)
    return paths
