"""Crossfade Tomatis processor (capability parity with
ref src/process_tomatis_xfade.py): the standard gate plus a rate-limited
alpha ramp, gains blended in the dB domain mid-transition. The alpha ramp
runs as a clip-affine associative scan (tomatis_tpu.ops.gate.alpha_ramp).
"""
from __future__ import annotations

from dataclasses import dataclass, asdict

import numpy as np

from tomatis_tpu.engine.streaming import (ChunkedStftEngine, StreamRunner,
                                          ramp_disabled, resolve_transport)
from tomatis_tpu.io import audio
from tomatis_tpu.models.controllers import GateXfadeController
from tomatis_tpu.ops import dsp, gate as gate_ops, stft
from tomatis_tpu.utils.stateio import StateCsvWriter


@dataclass
class XfadeParams:
    """Defaults = reference CLI (src/process_tomatis_xfade.py:360-390).
    Gate mapping is linear-only in this variant (:28-30)."""
    gate_ui: float = 50.0
    gate_scale: float = 1.0
    gate_offset: float = -100.0
    hysteresis_db: float = 3.0
    up_delay_ms: float = 250.0
    xfade_ms: float = 0.0              # 0 = hard switching
    fc: float = 1000.0
    slope: float = 12.0
    c1_low: float = +15.0
    c1_high: float = -15.0
    c2_low: float = -15.0
    c2_high: float = +15.0
    n_fft: int = 4096
    hop: int = 2048
    require_48k_stereo: bool = True

    def threshold_dbfs(self) -> float:
        return float(dsp.gate_ui_to_dbfs(self.gate_ui, self.gate_scale,
                                         self.gate_offset))

    def xfade_frames(self, sr: int) -> int:
        """ref :152-155: max(1, ceil(xfade_ms / frame_ms)) when enabled."""
        if self.xfade_ms <= 0:
            return 0
        frame_ms = self.hop / sr * 1000.0
        return max(1, int(np.ceil(self.xfade_ms / frame_ms)))


def build_controller(p: XfadeParams, sr: int) -> GateXfadeController:
    freqs = stft.rfft_freqs(p.n_fft, sr)
    g1_db = dsp.build_tilt_gain_db(freqs, p.fc, p.slope, p.c1_low, p.c1_high)
    g2_db = dsp.build_tilt_gain_db(freqs, p.fc, p.slope, p.c2_low, p.c2_high)
    T = p.threshold_dbfs()
    up_delay_samples = int(sr * p.up_delay_ms / 1000.0)
    xf = p.xfade_frames(sr)
    return GateXfadeController(
        g1_db, g2_db,
        ton=T + p.hysteresis_db / 2.0, toff=T - p.hysteresis_db / 2.0,
        delay_frames=gate_ops.updelay_frames(up_delay_samples, p.hop),
        xfade_frames=xf if xf > 0 else 1)  # step=1.0 == hard switch


def make_runner(p: XfadeParams, sr: int, channels: int, total: int,
                frames_per_chunk: int = 1024,
                transport: str = "f32") -> StreamRunner:
    engine = ChunkedStftEngine(p.n_fft, p.hop, channels, frames_per_chunk)
    # wire_input follows the transport, as in models.standard.make_runner
    return StreamRunner(engine, build_controller(p, sr), total,
                        transport=transport,
                        wire_input=(transport == "wire"))


def process_array(x: np.ndarray, sr: int, p: XfadeParams | None = None,
                  frames_per_chunk: int = 1024):
    p = p or XfadeParams()
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    runner = make_runner(p, sr, x.shape[1], len(x), frames_per_chunk)
    outs = []
    stats = runner.run(x, on_audio=outs.append)
    y = np.concatenate(outs, 0) if outs else np.zeros_like(x)
    return y, stats


def process(in_path, out_path, p: XfadeParams | None = None,
            state_csv_path=None, frames_per_chunk: int = 1024,
            checkpoint_path=None, checkpoint_every: int = 8,
            progress=None, transport: str = "auto") -> dict:
    """File-to-file crossfade processing; checkpoint_path enables the same
    chunk-granular crash recovery as the standard processor. transport as
    in models.standard.process ("auto" = wire when the output takes raw
    PCM_24 bytes)."""
    p = p or XfadeParams()
    # resolve BEFORE any file is opened — a rejected transport must not
    # truncate an existing output; every sink here is raw-capable PCM_24
    # (see models.standard.process)
    transport, byte_payload = resolve_transport(transport, True)
    with audio.AudioFile(in_path, "r") as fin:
        sr, ch, total = fin.samplerate, fin.channels, fin.frames
        if p.require_48k_stereo:
            if sr != 48000:
                raise ValueError(f"expected 48kHz, got {sr} Hz")
            if ch != 2:
                raise ValueError(f"expected stereo, got {ch} channels")
        out_path = str(out_path)
        # RESOLVED transport + in_path in the fingerprint, as in
        # models.standard.process
        from tomatis_tpu.models.standard import (finalize_checkpointed_sink,
                                                 open_checkpointed_sink)
        config = dict(asdict(p), sr=sr, ch=ch, total=total,
                      in_path=str(in_path),
                      frames_per_chunk=frames_per_chunk, model="xfade",
                      transport=transport,
                      # see models.standard: chunk schedule is identity
                      no_ramp=ramp_disabled())
        (fout, actual_out, ckpt, resume_state,
         stage_path) = open_checkpointed_sink(
            out_path, sr, ch, config, checkpoint_path, checkpoint_every)
        csvw = None
        try:
            assert fout.supports_raw, "process() sinks must take raw PCM_24"
            runner = make_runner(p, sr, ch, total, frames_per_chunk,
                                 transport=transport)
            resume_frame = None
            if resume_state is not None:
                resume_frame = resume_state["__meta__"]["scalars"][
                    "frames_consumed"]
            csvw = StateCsvWriter(state_csv_path, sr, total, with_alpha=True,
                                  level_fmt="%.2f", alpha_fmt="%.3f",
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
    stats.update(params=asdict(p), sr=sr, channels=ch, total=total,
                 threshold_dbfs=p.threshold_dbfs(),
                 xfade_frames=p.xfade_frames(sr), out_path=actual_out)
    return stats
