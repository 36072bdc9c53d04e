"""Step/propagation outcomes.

Reference parity: heyoka ``taylor_outcome`` (``include/heyoka/taylor.hpp:142-155``).
Delta: the reference biases enum values by -2**32 to reserve a 4-billion-wide
band for stopping-terminal-event indices; on device we carry outcomes as int32
lane values, so the codes are small negatives and terminal events are encoded
as the non-negative event index (stopping) per lane.
"""

from __future__ import annotations

import enum


class TaylorOutcome(enum.IntEnum):
    #: Integration step was successful, h determined by error control.
    success = -1
    #: Maximum number of steps reached in a propagate_*().
    step_limit = -2
    #: Time limit reached (also: propagate_* finished successfully).
    time_limit = -3
    #: Non-finite state detected at the end of the timestep.
    err_nf_state = -4
    #: Propagation stopped by callback.
    cb_stop = -5

    @staticmethod
    def is_terminal_event(code: int) -> bool:
        return code >= 0

    @staticmethod
    def terminal_event_index(code: int) -> int:
        assert code >= 0
        return int(code)
