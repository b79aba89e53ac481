"""Zone layout for the local lakehouse (README.markdown:161-189).

The reference's S3 bucket zones map 1:1 onto local directories:
raw/ preprocessed/ warehouse/ rejected/ archive/ logs/.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class ZoneConfig:
    root: str

    raw: str = field(init=False)
    preprocessed: str = field(init=False)
    warehouse: str = field(init=False)
    rejected: str = field(init=False)
    archive: str = field(init=False)
    logs: str = field(init=False)

    def __post_init__(self) -> None:
        self.raw = os.path.join(self.root, "raw")
        self.preprocessed = os.path.join(self.root, "preprocessed")
        self.warehouse = os.path.join(self.root, "warehouse", "lakehouse-dwh")
        self.rejected = os.path.join(self.root, "rejected")
        self.archive = os.path.join(self.root, "archive")
        self.logs = os.path.join(self.root, "logs")
        for d in (self.raw, self.preprocessed, self.rejected, self.archive, self.logs):
            os.makedirs(d, exist_ok=True)

    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)
