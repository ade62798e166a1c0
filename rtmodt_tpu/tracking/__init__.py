from rtmodt_tpu.tracking.bytetrack import (  # noqa: F401
    TrackState,
    init_track_state,
    bytetrack_update,
)
from rtmodt_tpu.tracking.tracker import MultiObjectTracker, Track  # noqa: F401
