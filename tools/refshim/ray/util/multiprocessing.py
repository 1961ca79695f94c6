class _Result:
    def __init__(self, values):
        self._values = values

    def get(self):
        return self._values


class Pool:
    def __init__(self, processes=None, initializer=None, initargs=()):
        if initializer is not None:
            initializer(*initargs)

    def starmap_async(self, fn, iterable):
        return _Result([fn(*args) for args in iterable])

    def map(self, fn, iterable):
        return [fn(x) for x in iterable]

    def close(self):
        pass

    def join(self):
        pass
