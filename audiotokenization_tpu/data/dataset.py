"""Filelist-driven audio dataset with the reference's exact crop/pad policy.

Reference: FSDataset / DataModule (BigCodec_SSL/data_module.py:20-148):

- filelists are text files whose lines are tab-split, first field = path
  (data_module.py:82-86); relative paths resolve against a root dir;
- load audio, resample if the file rate differs from cfg.sample_rate, take
  channel 0 (:95-100);
- if min_audio_length != -1: right-pad short clips to min_audio_length, then
  crop exactly min_audio_length samples — random offset when training,
  offset 0 for eval (:102-111);
- zero-pad the tail so length % pad_to_multiple_of == 0 (:112-122);
- collate stacks into {"wav": (B, T)} (:136-148).

TPU-first replacements for the torch DataLoader machinery: a thread-pool
prefetching iterator (audio decode is I/O + the native FLAC decoder, which
releases the GIL inside ctypes), deterministic per-epoch shuffling, and
multi-host sharding by filelist stripe (process i takes lines i::N).
"""
from __future__ import annotations

import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

from ..config import DatasetSplit
from .audio_io import read_audio


def read_filelist(path, root: Optional[str] = None) -> list:
    """Tab-split first field per line; resolve relative paths against root."""
    lines = Path(path).read_text().splitlines()
    out = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        p = line.split("\t")[0]
        if root is not None and not Path(p).is_absolute():
            p = str(Path(root) / p)
        out.append(p)
    return out


def load_clip(path, *, sample_rate: int, min_audio_length: int,
              pad_to_multiple_of: int, train: bool,
              rng: Optional[np.random.RandomState] = None,
              return_start: bool = False, crop_multiple: int = 1):
    """Load one file and apply the crop/pad policy. Returns float32 (T,)
    [, the crop's start sample when return_start — needed to align
    precomputed per-frame targets to a random crop].

    crop_multiple: restrict random crop starts to multiples of this (the
    frame hop) so precomputed per-frame targets align EXACTLY — an
    unrestricted start would leave up to hop-1 samples of systematic
    audio/target shift after flooring start//hop."""
    wav, sr = read_audio(path)
    wav = wav[0]  # channel 0
    if sr != sample_rate:
        from ..ops.resample import resample

        wav = np.asarray(resample(wav, sr, sample_rate))
    start = 0
    if min_audio_length != -1:
        if len(wav) < min_audio_length:
            wav = np.pad(wav, (0, min_audio_length - len(wav)))
        if train:
            hi = (len(wav) - min_audio_length) // crop_multiple + 1
            start = int((rng or np.random).randint(0, hi)) * crop_multiple
        wav = wav[start:start + min_audio_length]
    if pad_to_multiple_of and len(wav) % pad_to_multiple_of != 0:
        wav = np.pad(wav, (0, pad_to_multiple_of - len(wav) % pad_to_multiple_of))
    wav = wav.astype(np.float32)
    return (wav, start) if return_start else wav


class AudioDataset:
    """Map-style dataset over a filelist.

    semantic_dir: optional directory of precomputed w2v-bert targets
    (<stem>.npy, (1024, Tf) — see cli/precompute_semantic.py); when set,
    items also carry a "semantic_target" aligned to the clip's frames
    (sliced at the random crop's frame offset, so the target describes the
    cropped audio).

    compute_feats: emit the w2v-bert teacher's input features from the
    cropped wav as item key "feats" (nf', 160) — the reference's in-loop
    SSL path, which runs AutoFeatureExtractor on the ±160-padded crop in
    the dataloader (data_module.py:124-132).
    """

    def __init__(self, split: DatasetSplit, *, sample_rate: int,
                 pad_to_multiple_of: int, root: Optional[str] = None,
                 train: bool = False, semantic_dir: Optional[str] = None,
                 hop_length: int = 200, compute_feats: bool = False):
        self.files = read_filelist(split.filelist, root)
        self.split = split
        self.sample_rate = sample_rate
        self.pad_to_multiple_of = pad_to_multiple_of
        self.train = train
        self.semantic_dir = Path(semantic_dir) if semantic_dir else None
        self.hop_length = hop_length
        self.compute_feats = compute_feats

    def __len__(self):
        return len(self.files)

    def get(self, idx: int, rng=None):
        wav, start = load_clip(
            self.files[idx], sample_rate=self.sample_rate,
            min_audio_length=self.split.min_audio_length,
            pad_to_multiple_of=self.pad_to_multiple_of,
            train=self.train, rng=rng, return_start=True,
            crop_multiple=self.hop_length if self.semantic_dir else 1)
        if self.semantic_dir is None and not self.compute_feats:
            return wav
        item = {"wav": wav}
        if self.compute_feats:
            from ..ops.fbank import w2v_bert_features_from_clip

            item["feats"] = w2v_bert_features_from_clip(wav)
        if self.semantic_dir is not None:
            sem = np.load(self.semantic_dir / (Path(self.files[idx]).stem + ".npy"))
            f0 = start // self.hop_length  # align target to the crop offset
            tf = len(wav) // self.hop_length
            sem = sem[:, f0:f0 + tf]
            if sem.shape[1] < tf:
                sem = np.pad(sem, ((0, 0), (0, tf - sem.shape[1])))
            item["semantic_target"] = sem.astype(np.float32)
        return item


class DataLoader:
    """Batched, prefetching iterator with deterministic epoch shuffling.

    Multi-host: pass process_index/process_count to stripe the filelist
    (the jax.process_index() equivalent of DistributedSampler).
    """

    def __init__(self, dataset: AudioDataset, *, batch_size: int,
                 shuffle: bool = False, seed: int = 0, num_workers: int = 8,
                 drop_last: bool = True, process_index: int = 0,
                 process_count: int = 1, prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        if self.process_count > 1:
            # torch DistributedSampler semantics (the reference's DDP loader,
            # data_module.py via Lightning): pad the global list by repeating
            # from the front until it divides evenly, so EVERY process yields
            # the same number of batches. Unequal stripes would deadlock a
            # collectively-compiled train/eval step — the short-striped
            # process stops invoking the program while its peers wait in a
            # collective (see run_validation).
            per = -(-len(idx) // self.process_count)
            total = per * self.process_count
            if total > len(idx):
                idx = np.concatenate([idx, idx[:total - len(idx)]])
        return idx[self.process_index::self.process_count]

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        # deterministic seed mix independent of PYTHONHASHSEED (hash() is
        # randomized for str seeds); SeedSequence mixes arbitrary int entropy
        import zlib

        ent = (self.seed if isinstance(self.seed, (int, np.integer))
               else zlib.crc32(str(self.seed).encode()))
        mix = np.random.SeedSequence([int(ent) & 0xFFFFFFFF, self.epoch])
        rng = np.random.RandomState(mix.generate_state(1)[0] % (2 ** 31))
        seeds = rng.randint(0, 2 ** 31, size=len(indices))
        seed_of = dict(zip(indices.tolist(), seeds.tolist()))

        def load_batch(batch_idx):
            items = [self.ds.get(int(i), np.random.RandomState(seed_of[int(i)]))
                     for i in batch_idx]
            if not isinstance(items[0], dict):
                items = [{"wav": it} for it in items]
            clips = [it["wav"] for it in items]
            max_len = max(len(c) for c in clips)
            wav = np.zeros((len(clips), max_len), np.float32)
            for j, c in enumerate(clips):
                wav[j, :len(c)] = c
            batch = {"wav": wav,
                     "lengths": np.asarray([len(c) for c in clips], np.int32)}
            if "feats" in items[0]:
                feats = [it["feats"] for it in items]
                nf = max(f.shape[0] for f in feats)
                fb = np.zeros((len(feats), nf, feats[0].shape[1]), np.float32)
                for j, f in enumerate(feats):
                    fb[j, :f.shape[0]] = f
                batch["feats"] = fb
            if "semantic_target" in items[0]:
                sems = [it["semantic_target"] for it in items]
                tf = max(s.shape[1] for s in sems)
                sem = np.zeros((len(sems), sems[0].shape[0], tf), np.float32)
                for j, s in enumerate(sems):
                    sem[j, :, :s.shape[1]] = s
                batch["semantic_target"] = sem
            return batch

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = iter(batches)
            for _ in range(min(self.prefetch, len(batches))):
                pending.append(pool.submit(load_batch, next(it)))
            while pending:
                fut = pending.pop(0)
                try:
                    nxt = next(it)
                    pending.append(pool.submit(load_batch, nxt))
                except StopIteration:
                    pass
                yield fut.result()
        self.epoch += 1
