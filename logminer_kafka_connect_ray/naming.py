"""Output-path / topic-style naming.

Pure-function re-expression of the reference's name sanitization
(``SourceDatabaseNameService.kt:5-27``: ``{dbName}.{owner}.{table}``
with every char outside ``[A-Za-z0-9._-]`` replaced by ``_``) and
``TableId`` validation (``TableId.kt:9-13``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SANITIZE = re.compile(r"[^a-zA-Z0-9._\-]")
_VALID_IDENT = re.compile(r"^[^\s]+$")


def sanitize_name(name: str) -> str:
    """Replace characters illegal in a topic/path name with '_'.

    Mirrors SourceDatabaseNameService.kt:12-18.
    """
    return _SANITIZE.sub("_", name)


@dataclass(frozen=True)
class TableRef:
    """Logical table identity (reference TableId.kt:5-28)."""

    owner: str
    table: str

    def __post_init__(self):
        for part in (self.owner, self.table):
            if not part or not _VALID_IDENT.match(part):
                raise ValueError(f"invalid table identifier part: {part!r}")

    @property
    def full_name(self) -> str:
        return f"{self.owner}.{self.table}"

    def output_name(self, db_name: str = "lake") -> str:
        """`{db}.{owner}.{table}` sanitized -- the partition-directory
        name for this table (≙ Kafka topic name)."""
        return sanitize_name(f"{db_name}.{self.owner}.{self.table}")


def matches_whitelist(table: str, whitelist: tuple[str, ...]) -> bool:
    """Table whitelist semantics (reference SourceConnectorConfig.kt:86-97):
    an entry `OWNER.TABLE` matches that table; `OWNER` alone matches
    every table of the owner (schema selector, SourceTask.kt:46-63)."""
    if not whitelist:
        return True
    t = table.upper()
    for entry in whitelist:
        e = entry.upper()
        if t == e or t.startswith(e + "."):
            return True
        if "." in t and t.split(".", 1)[0] == e:
            return True
    return False
