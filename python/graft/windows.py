"""Window specs (≙ /root/reference/python/ts/flint/windows.py): small
tokens accepted by ``summarize_windows(...)`` / ``add_windows(...)`` via
their ``window=`` argument, so reference-style call sites port verbatim::

    from graft import windows
    df.summarize_windows(summarizers.mean('v'),
                         window=windows.past_absolute_time('1d'),
                         key=['id'])
"""


class WindowSpec:
    __slots__ = ("past", "future")

    def __init__(self, past=None, future=None):
        self.past = past
        self.future = future


def past_absolute_time(duration):
    """[t - duration, t] (≙ windows.past_absolute_time)."""
    return WindowSpec(past=duration)


def future_absolute_time(duration):
    """[t, t + duration] (≙ windows.future_absolute_time)."""
    return WindowSpec(future=duration)
