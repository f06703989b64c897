"""Run logging: append-mode file log + CSV metric history.

Replaces the reference's TensorBoard/CSV/Neptune trio
(reference train.py:97-131) with a dependency-free CSV metrics file and
an fsynced text log (reference log.py:2-15).
"""

from __future__ import annotations

import csv
import datetime
import os
from typing import Dict, Optional


class RunLogger:
    def __init__(self, run_dir: str, name: str = "train"):
        self.run_dir = run_dir
        os.makedirs(os.path.join(run_dir, "logs"), exist_ok=True)
        self._log_path = os.path.join(run_dir, "logs", f"{name}.log")
        self._csv_path = os.path.join(run_dir, "logs", f"{name}_metrics.csv")
        self._csv_fields: Optional[list] = None

    def log(self, msg: str) -> None:
        stamp = datetime.datetime.now().isoformat(timespec="seconds")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        with open(self._log_path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    def metrics(self, step: int, phase: str, split: str,
                values: Dict[str, float]) -> None:
        row = {"step": step, "phase": phase, "split": split,
               **{k: float(v) for k, v in values.items()}}
        write_header = not os.path.exists(self._csv_path)
        if self._csv_fields is None:
            self._csv_fields = list(row.keys())
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields,
                               extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)
