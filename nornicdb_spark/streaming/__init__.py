"""Temporal / streaming operators — SURVEY §2.11.

decay      — 3-tier exponential decay scoring (batch recompute)
sessions   — gap sessionization, co-access inference (batch + streaming)
kalman     — scalar & velocity Kalman smoothing via applyInPandas
structured — Structured Streaming pipelines over the events table
"""
