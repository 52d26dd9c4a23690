"""Reusable DataFrame operators (the engine's library surface).

Each module composes built-in Catalyst operators; Python/Pandas UDFs appear
only where DataFrame primitives genuinely cannot express the semantics
(SURVEY.md §2.10 policy: zero Python UDFs for reference semantics).
"""
