"""Retention job — the reference's 3-day S3 lifecycle expiration
(``main.tf:166-189``) as an explicit partition-drop maintenance job.

Hive-layout zones delete whole ``load_date=`` partition directories; the
raw date-path zone (``raw/YYYY/MM/DD``) prunes by path. Table formats
(Delta/Iceberg) would replace this with VACUUM/expire_snapshots — not
required by the reference's plain-parquet layout.
"""

from __future__ import annotations

import datetime as dt
import re
import shutil
from pathlib import Path

_PARTITION_RE = re.compile(r"^load_date=(\d{4}-\d{2}-\d{2})$")


def expire_partitions(curated_root: str, keep_days: int, today: dt.date) -> list[str]:
    """Drop curated ``load_date=`` partitions older than ``keep_days``.
    Returns the dropped partition names. Pure filesystem metadata work —
    no Spark job needed, mirroring the reference's lifecycle rule."""
    cutoff = today - dt.timedelta(days=keep_days)
    dropped = []
    root = Path(curated_root)
    if not root.exists():
        return dropped
    for child in sorted(root.iterdir()):
        m = _PARTITION_RE.match(child.name)
        if m and dt.date.fromisoformat(m.group(1)) < cutoff:
            shutil.rmtree(child)
            dropped.append(child.name)
    return dropped


def expire_raw_days(raw_root: str, keep_days: int, today: dt.date) -> list[str]:
    """Drop raw ``YYYY/MM/DD`` day directories older than ``keep_days``."""
    cutoff = today - dt.timedelta(days=keep_days)
    dropped = []
    root = Path(raw_root)
    if not root.exists():
        return dropped
    for day_dir in sorted(root.glob("[0-9][0-9][0-9][0-9]/[0-9][0-9]/[0-9][0-9]")):
        y, m, d = day_dir.parts[-3:]
        if dt.date(int(y), int(m), int(d)) < cutoff:
            shutil.rmtree(day_dir)
            dropped.append(f"{y}/{m}/{d}")
    return dropped
