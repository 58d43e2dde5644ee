"""Structured Streaming jobs — a pure capability upgrade.

The reference is batch-only: no watermarks, no event-time windows, no
stateful operators (SURVEY.md §2.10); continuous behavior was approximated
by cron-rerun pipelines. Here the same logical plans run incrementally.
"""
