"""Tiny MAF-only replacement for Bio.AlignIO used by the reference's
read_data.py.  Supports exactly the attribute surface the reference touches:
iteration over blocks, ``seqrec.name``, ``seqrec.seq`` and
``seqrec.annotations['start'|'strand'|'srcSize']``."""


class _SeqRec:
    def __init__(self, src, start, size, strand, src_size, text):
        self.name = src
        self.id = src
        self.seq = text
        self.annotations = {
            "start": start,
            "size": size,
            "strand": strand,
            "srcSize": src_size,
        }


class _Alignment(list):
    pass


def parse(path, fmt):
    assert fmt == "maf"
    block = None
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("a"):
                if block:
                    yield block
                block = _Alignment()
            elif line.startswith("s ") and block is not None:
                parts = line.split()
                src, start, size, strand, src_size, text = (
                    parts[1],
                    int(parts[2]),
                    int(parts[3]),
                    parts[4],
                    int(parts[5]),
                    parts[6],
                )
                block.append(
                    _SeqRec(src, start, size, 1 if strand == "+" else -1, src_size, text)
                )
            elif not line.strip() and block is not None:
                yield block
                block = None
    if block:
        yield block
