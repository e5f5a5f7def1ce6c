"""Deferred registration shim: registers the round-1-verified tail
analytics queries (ev_pivot / ev_rollup / json_*) AFTER the streaming
family, so the externally-checked registry prefix covers the operator
families that have not yet had a driver correctness row. Imported by
plans.registry._load_all after ebike_spark.streaming.events."""

from ebike_spark.plans.analytics import _register_late

_register_late()
