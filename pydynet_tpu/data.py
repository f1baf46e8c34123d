"""Data pipeline (parity with /root/reference/pydynet/data.py:4-123).

PyTorch-shaped Dataset / Sampler / BatchSampler / DataLoader, all host-side
NumPy; batches are fancy-indexed in one shot (data.py:79-81).  On TPU the
device transfer happens per-batch at the ``.to(device)`` / jit boundary.
"""
from numpy.random import permutation


class Dataset:

    def __getitem__(self, index):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError


class Sampler:

    def __init__(self, dataset: Dataset) -> None:
        pass

    def __iter__(self):
        raise NotImplementedError


class SequentialSampler(Sampler):

    def __init__(self, dataset: Dataset) -> None:
        self.dataset = dataset

    def __iter__(self):
        return iter(range(len(self.dataset)))

    def __len__(self) -> int:
        return len(self.dataset)


class RandomSampler(Sampler):

    def __init__(self, dataset: Dataset) -> None:
        self.dataset = dataset

    def __iter__(self):
        yield from permutation(len(self.dataset)).tolist()

    def __len__(self):
        return len(self.dataset)


class BatchSampler(Sampler):

    def __init__(self, sampler: Sampler, batch_size: int,
                 drop_last: bool) -> None:
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if len(batch) > 0 and not self.drop_last:
            yield batch

    def __len__(self):
        if self.drop_last:
            return len(self.sampler) // self.batch_size
        return (len(self.sampler) + self.batch_size - 1) // self.batch_size


class _DataLoaderIter:

    def __init__(self, loader) -> None:
        self.loader = loader
        self.sample_iter = iter(self.loader.batch_sampler)

    def __next__(self):
        index = next(self.sample_iter)
        return self.loader.dataset[index]

    def __iter__(self):
        return self


class _PrefetchIter:
    """Background-thread prefetch: batch assembly (NumPy fancy-indexing,
    which releases the GIL) overlaps the accelerator step."""

    _DONE = object()

    def __init__(self, loader, depth: int) -> None:
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._error = None
        self._stop = threading.Event()
        inner = _DataLoaderIter(loader)

        def put(item) -> bool:
            # bounded put that notices shutdown: a consumer that stops
            # iterating early (break / exception / GC) would otherwise leave
            # this thread blocked on a full queue forever, pinning `depth`
            # assembled batches and the dataset
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in inner:
                    if not put(batch):
                        return
            except BaseException as e:  # surface in the consumer thread
                self._error = e
            finally:
                put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        self._stop.set()

    __del__ = close

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    def __iter__(self):
        return self


class DataLoader:

    def __init__(self, dataset: Dataset, batch_size: int = 1,
                 shuffle: bool = False, drop_last: bool = False,
                 prefetch: int = 0) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sampler = (RandomSampler if shuffle else
                        SequentialSampler)(dataset)
        self.batch_sampler = BatchSampler(self.sampler, batch_size, drop_last)

    def __iter__(self):
        if self.prefetch > 0:
            return _PrefetchIter(self, self.prefetch)
        return _DataLoaderIter(self)

    def __len__(self):
        return len(self.batch_sampler)


def data_loader(X, y, batch_size: int, shuffle: bool = False) -> DataLoader:

    class TrainSet(Dataset):

        def __init__(self, X, y) -> None:
            self.data = X
            self.target = y

        def __getitem__(self, index):
            return self.data[index], self.target[index]

        def __len__(self):
            return len(self.data)

    return DataLoader(TrainSet(X, y), batch_size, shuffle)
