"""Plane-B query pack (SURVEY.md §2 Plane B) — placeholder, filled next."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict = {}
