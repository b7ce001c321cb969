"""Standard Tomatis processor — the framework's flagship pipeline.

Capability parity with ref src/process_tomatis.py (CLI flags :488-515,
process() :160-479), rebuilt on the chunked TPU stream engine: batched
frame levels, associative-scan gate, one rFFT bank per chunk, K-way OLA.
"""
from __future__ import annotations

from dataclasses import dataclass, asdict

import numpy as np

from tomatis_tpu.engine.streaming import (ChunkedStftEngine, StreamRunner,
                                          ramp_disabled, resolve_transport)
from tomatis_tpu.io import audio
from tomatis_tpu.models.controllers import GateSelectController
from tomatis_tpu.ops import dsp, gate as gate_ops, stft
from tomatis_tpu.utils.stateio import StateCsvWriter


@dataclass
class StandardParams:
    """All knobs of the standard processor (defaults = reference CLI
    defaults, src/process_tomatis.py:488-515)."""
    gate_ui: float = 50.0
    gate_mode: str = "log_percent"      # or "linear"
    dynamic_range: float = 80.0
    gate_scale: float = 1.0
    gate_offset: float = -100.0
    hysteresis_db: float = 3.0
    up_delay_ms: float = 250.0
    fc: float = 1000.0
    slope: float = 12.0
    c1_low: float = +15.0
    c1_high: float = -15.0
    c2_low: float = -15.0
    c2_high: float = +15.0
    n_fft: int = 4096
    hop: int = 2048
    output_gain_db: float = 0.0
    require_48k_stereo: bool = True     # reference hard check (:234-237)

    def threshold_dbfs(self) -> float:
        if self.gate_mode == "log_percent":
            return float(dsp.gate_ui_to_dbfs_log_percent(
                self.gate_ui, self.dynamic_range))
        return float(dsp.gate_ui_to_dbfs(
            self.gate_ui, self.gate_scale, self.gate_offset))


def build_controller(p: StandardParams, sr: int) -> GateSelectController:
    freqs = stft.rfft_freqs(p.n_fft, sr)
    g1 = dsp.db_to_lin(dsp.build_tilt_gain_db(
        freqs, p.fc, p.slope, p.c1_low, p.c1_high))
    g2 = dsp.db_to_lin(dsp.build_tilt_gain_db(
        freqs, p.fc, p.slope, p.c2_low, p.c2_high))
    T = p.threshold_dbfs()
    ton = T + p.hysteresis_db / 2.0
    toff = T - p.hysteresis_db / 2.0
    up_delay_samples = int(sr * p.up_delay_ms / 1000.0)
    delay_frames = gate_ops.updelay_frames(up_delay_samples, p.hop)
    return GateSelectController(g1, g2, ton, toff, delay_frames)


def make_runner(p: StandardParams, sr: int, channels: int, total: int,
                frames_per_chunk: int = 1024,
                transport: str = "f32") -> StreamRunner:
    engine = ChunkedStftEngine(p.n_fft, p.hop, channels, frames_per_chunk)
    # wire_input follows the transport: pcm24/f32 exist to bypass the
    # codec (PCIe hosts / debug), so they ship the input uncompressed too
    return StreamRunner(engine, build_controller(p, sr), total,
                        output_gain_db=p.output_gain_db, transport=transport,
                        wire_input=(transport == "wire"))


def process_array(x: np.ndarray, sr: int, p: StandardParams | None = None,
                  frames_per_chunk: int = 1024):
    """In-memory processing: returns (y [N, C] float32, stats dict).

    Same math as process() without file I/O — the unit-test / library entry.
    """
    p = p or StandardParams()
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    runner = make_runner(p, sr, x.shape[1], len(x), frames_per_chunk)
    outs = []
    stats = runner.run(x, on_audio=outs.append)
    y = np.concatenate(outs, 0) if outs else np.zeros_like(x)
    return y, stats


def process(in_path, out_path, p: StandardParams | None = None,
            state_csv_path=None, frames_per_chunk: int = 1024,
            checkpoint_path=None, checkpoint_every: int = 8,
            progress=None, transport: str = "auto") -> dict:
    """File-to-file processing with reference CLI semantics.

    - validates 48 kHz stereo when p.require_48k_stereo (ref :234-237)
    - writes FLAC PCM_24 for .flac outputs, WAV PCM_24 otherwise; if FLAC
      encoding is unavailable falls back to .wav (ref :241-251)
    - optional per-frame state CSV (ref :302-307,408-409)
    - checkpoint_path enables chunk-granular crash recovery: stream state
      is persisted every checkpoint_every chunks; re-running the same call
      resumes from the last checkpoint. FLAC outputs stage through a .part
      WAV and are encoded on completion (WAV supports truncate+append).
    """
    import time
    t_start = time.perf_counter()
    p = p or StandardParams()
    # Resolve the transport BEFORE any file is opened: a rejected value
    # must not truncate an existing output. Every sink this function
    # creates is PCM_24 (WAV or FLAC, including the checkpoint staging
    # WAV), and both containers accept raw PCM_24 bytes, so the sink is
    # always raw-capable; the assert below guards that invariant if a
    # non-raw subtype is ever introduced here.
    transport, byte_payload = resolve_transport(transport, True)
    with audio.AudioFile(in_path, "r") as fin:
        sr, ch, total = fin.samplerate, fin.channels, fin.frames
        if p.require_48k_stereo:
            if sr != 48000:
                raise ValueError(f"expected 48kHz, got {sr} Hz")
            if ch != 2:
                raise ValueError(f"expected stereo, got {ch} channels")

        out_path = str(out_path)
        # the RESOLVED transport is part of the fingerprint: the
        # persisted pending output is PCM bytes under wire/pcm24 but
        # float samples under f32 — resuming across payload formats
        # must be refused, while an --transport auto checkpoint stays
        # resumable with an explicit --transport wire (same resolved
        # value). in_path is part of the identity: a checkpoint must not
        # resume against a different file that happens to share
        # sr/ch/length (same guard as eq's apply_gain_stream).
        config = dict(asdict(p), sr=sr, ch=ch, total=total,
                      in_path=str(in_path),
                      frames_per_chunk=frames_per_chunk,
                      model="standard", transport=transport,
                      # chunk schedule decides float summation order:
                      # a TOMATIS_NO_RAMP checkpoint must not resume
                      # with the ramp back on (see streaming.ramp_disabled)
                      no_ramp=ramp_disabled())
        (fout, actual_out, ckpt, resume_state,
         stage_path) = open_checkpointed_sink(
            out_path, sr, ch, config, checkpoint_path, checkpoint_every)

        # Transport over the host<->device link ("auto" = wire when the
        # output container takes raw PCM_24 bytes): "wire" compresses
        # both directions losslessly (best over thin links), "pcm24"
        # packs device-side without the codec (best on PCIe-attached
        # hosts where the link is free and host cores are scarce),
        # "f32" ships floats (debug). All are byte-identical to <=1 LSB.
        csvw = None
        try:
            assert fout.supports_raw, "process() sinks must take raw PCM_24"
            runner = make_runner(p, sr, ch, total, frames_per_chunk,
                                 transport=transport)
            resume_frame = None
            if resume_state is not None:
                resume_frame = resume_state["__meta__"]["scalars"][
                    "frames_consumed"]
            csvw = StateCsvWriter(state_csv_path, sr, total,
                                  resume_at_frame=resume_frame) \
                if state_csv_path else None
            stats = runner.run(fin,
                               on_audio=(fout.write_raw if byte_payload
                                         else fout.write),
                               on_frames=csvw.on_frames if csvw else None,
                               ckpt=ckpt, resume_state=resume_state,
                               on_progress=progress)
        finally:
            fout.close()
            if csvw:
                csvw.close()
        actual_out = (finalize_checkpointed_sink(ckpt, stage_path,
                                                 out_path) or actual_out)

    wall = time.perf_counter() - t_start
    stats.update(params=asdict(p), sr=sr, channels=ch, total=total,
                 threshold_dbfs=p.threshold_dbfs(), out_path=actual_out,
                 wall_seconds=wall,
                 realtime_factor=(total / sr) / wall if wall > 0 else 0.0)
    return stats


def open_checkpointed_sink(out_path, sr, ch, config, checkpoint_path,
                           checkpoint_every):
    """Open the PCM_24 sink a processor writes to — shared by the
    standard and crossfade processors.

    Without a checkpoint: the requested container directly, falling back
    to WAV with a conversion hint when it cannot be encoded (e.g. FLAC
    without g++ — ref src/process_tomatis.py:241-251,471-474). With a
    checkpoint: a staged WAV (WAV supports truncate+append on resume),
    reopened at the persisted sample count when a compatible checkpoint
    + stage exist, with stale checkpoints (no stage file) cleared NOW —
    a crash before the first new snapshot must not resume the old
    offsets against the new stage.

    Returns (fout, actual_out, ckpt, resume_state, stage_path)."""
    import os
    out_path = str(out_path)
    if not checkpoint_path:
        try:
            fout = audio.AudioFile(out_path, "w", samplerate=sr,
                                   channels=ch, subtype="PCM_24")
            return fout, out_path, None, None, None
        except Exception as enc_err:
            actual_out = _wav_sibling(out_path)
            print(f"[WARN] cannot encode {out_path!r} ({enc_err}); "
                  f"writing WAV instead: {actual_out}\n"
                  f"       convert later with "
                  f"`tomatis convert -i {actual_out} -o {out_path}` "
                  f"(or ffmpeg)")
            fout = audio.AudioFile(actual_out, "w", samplerate=sr,
                                   channels=ch, subtype="PCM_24")
            return fout, actual_out, None, None, None

    from tomatis_tpu.engine.checkpoint import CheckpointManager
    from tomatis_tpu.io.wav import WavWriter
    ckpt = CheckpointManager(checkpoint_path, config, checkpoint_every)
    resume_state = ckpt.load()
    stage_path = (out_path if out_path.lower().endswith(".wav")
                  else out_path + ".part.wav")
    if resume_state is not None and os.path.exists(stage_path):
        sc = resume_state["__meta__"]["scalars"]
        fout = _RawWav(WavWriter.reopen(stage_path,
                                        sc["audio_samples_written"]), ch)
    else:
        if resume_state is not None:
            ckpt.clear()
        resume_state = None
        fout = _RawWav(WavWriter(stage_path, sr, ch, "PCM_24"), ch)
    return fout, out_path, ckpt, resume_state, stage_path


def finalize_checkpointed_sink(ckpt, stage_path, out_path) -> str:
    """Epilogue of a checkpointed run: transcode the staged WAV into the
    requested container and drop the checkpoint. No-op without one.

    When the requested container cannot be encoded (e.g. FLAC without
    g++), the completed audio is kept as a WAV next to the requested
    path with a conversion hint — same graceful degradation as the
    uncheckpointed open (ref src/process_tomatis.py:241-251,471-474).
    Returns the path actually holding the output, or None when there
    was no checkpoint (the caller's sink-open already settled the
    actual path, possibly to its own WAV fallback)."""
    if ckpt is None:
        return None
    import os
    actual = str(out_path)
    if stage_path != actual:
        try:
            _transcode_wav_to(stage_path, actual)
        except Exception as enc_err:
            try:   # a mid-transcode failure can leave a partial output
                if os.path.exists(actual):
                    os.remove(actual)
            except OSError:
                pass
            actual = _wav_sibling(actual)
            os.replace(stage_path, actual)
            print(f"[WARN] cannot encode {out_path!r} ({enc_err}); "
                  f"kept the completed audio as WAV: {actual}\n"
                  f"       convert later with "
                  f"`tomatis convert -i {actual} -o {out_path}` "
                  f"(or ffmpeg)")
        else:
            try:
                os.remove(stage_path)
            except OSError:
                pass   # output is complete; a stale stage file is noise
    ckpt.clear()
    return actual


def _wav_sibling(path: str) -> str:
    """`x.flac` -> `x.wav`; extension-less paths just append (splitext,
    not rsplit('.') — a dot in a PARENT directory must not truncate)."""
    import os
    return os.path.splitext(path)[0] + ".wav"


class _RawWav:
    """Minimal AudioFile-like adapter over a bare WavWriter (for the
    checkpointed staging path)."""

    def __init__(self, writer, channels):
        self._w = writer
        self.channels = channels
        self.subtype = writer.subtype

    @property
    def supports_raw(self):
        return self.subtype == "PCM_24"

    def write(self, data):
        self._w.write(data)

    def write_raw(self, raw):
        self._w.write_raw(raw)

    def close(self):
        self._w.close()


def _transcode_wav_to(wav_path, out_path):
    """Stream-copy a staged WAV into the final container (e.g. FLAC)."""
    with audio.AudioFile(wav_path, "r") as fin, \
            audio.AudioFile(str(out_path), "w", samplerate=fin.samplerate,
                            channels=fin.channels, subtype="PCM_24") as fo:
        while True:
            x = fin.read(fin.samplerate * 30)
            if len(x) == 0:
                break
            fo.write(x)
