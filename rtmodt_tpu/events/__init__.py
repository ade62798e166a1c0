from rtmodt_tpu.events.zone_engine import Zone, ZoneEvent, ZoneEventEngine  # noqa: F401
