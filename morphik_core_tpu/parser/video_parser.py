"""Video parsing: frame sampling -> vision-LLM frame descriptions.

Behavioral model: reference core/parser/video/parse_video.py:27-280
(cv2 frame sampling at frame_sample_rate, base64 frames to a vision
model, TimeSeriesData time->content outputs; optional transcript).
Transcription (AssemblyAI in the reference) is provider-gated: absent
here, the transcript series is empty."""

from __future__ import annotations

import logging
import tempfile
from pathlib import Path
from typing import Awaitable, Callable, Dict, List, Optional, Tuple

from morphik_core_tpu.models.schemas import TimeSeriesData
from morphik_core_tpu.utils.fast_ops import bytes_to_data_uri

logger = logging.getLogger(__name__)

DescribeFn = Callable[[str, str], Awaitable[str]]  # (frame_data_uri, context) -> description
TranscribeFn = Callable[[bytes], Awaitable[Dict[float, str]]]  # video bytes -> {t_s: text}


class OpenAITranscriptionClient:
    """Transcript provider over any OpenAI-compatible
    POST /audio/transcriptions endpoint (whisper.cpp servers, hosted
    APIs) — fills the role of the reference's AssemblyAI integration
    (parse_video.py:162-253). verbose_json segments become the
    {start_s: text} map TimeSeriesData wants."""

    def __init__(self, api_base: str, api_key: Optional[str] = None, model: str = "whisper-1",
                 timeout: float = 300.0):
        self.api_base = api_base.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.timeout = timeout

    async def _request(self, url: str, files: dict, data: dict, headers: dict) -> dict:
        """Transport seam (tests stub this)."""
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            r = await client.post(url, files=files, data=data, headers=headers)
            r.raise_for_status()
            return r.json()

    async def __call__(self, video_bytes: bytes) -> Dict[float, str]:
        headers = {}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        out = await self._request(
            f"{self.api_base}/audio/transcriptions",
            files={"file": ("video.mp4", video_bytes, "video/mp4")},
            data={"model": self.model, "response_format": "verbose_json"},
            headers=headers,
        )
        segments = out.get("segments") or []
        if not segments and out.get("text"):
            return {0.0: out["text"]}
        return {float(s.get("start", 0.0)): str(s.get("text", "")).strip()
                for s in segments if str(s.get("text", "")).strip()}


class VideoParser:
    def __init__(
        self,
        video_bytes: bytes,
        describe_fn: Optional[DescribeFn] = None,
        frame_sample_rate: int = 120,
        transcribe_fn: Optional[TranscribeFn] = None,
    ):
        self.video_bytes = video_bytes
        self.describe_fn = describe_fn
        self.frame_sample_rate = frame_sample_rate
        self.transcribe_fn = transcribe_fn

    def sample_frames(self) -> Tuple[List[Tuple[float, bytes]], Dict[str, float]]:
        """-> ([(timestamp_s, jpeg_bytes)], {fps, duration, frame_count})."""
        import cv2

        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            f.write(self.video_bytes)
            path = f.name
        try:
            cap = cv2.VideoCapture(path)
            if not cap.isOpened():
                raise ValueError("could not open video")
            fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
            frames: List[Tuple[float, bytes]] = []
            idx = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if idx % self.frame_sample_rate == 0:
                    ok2, buf = cv2.imencode(".jpg", frame, [int(cv2.IMWRITE_JPEG_QUALITY), 80])
                    if ok2:
                        frames.append((idx / fps, bytes(buf)))
                idx += 1
            cap.release()
            return frames, {"fps": float(fps), "duration": total / fps if fps else 0.0, "frame_count": float(total)}
        finally:
            Path(path).unlink(missing_ok=True)

    async def process_video(self) -> Dict[str, TimeSeriesData]:
        """-> {"frame_descriptions": TimeSeriesData, "transcript": TimeSeriesData}"""
        frames, meta = self.sample_frames()
        logger.info("sampled %d frames (%.1fs video)", len(frames), meta["duration"])
        time_to_desc: Dict[float, str] = {}
        prev = ""
        for ts, jpeg in frames:
            if self.describe_fn is None:
                desc = f"frame at {ts:.1f}s"
            else:
                desc = await self.describe_fn(bytes_to_data_uri(jpeg, "image/jpeg"), prev)
            time_to_desc[ts] = desc
            prev = desc
        transcript: Dict[float, str] = {}
        if self.transcribe_fn is not None:
            try:
                transcript = await self.transcribe_fn(self.video_bytes)
            except Exception as e:  # provider outage must not fail ingest
                logger.warning("transcription failed (%s); continuing without transcript", e)
        return {
            "frame_descriptions": TimeSeriesData(time_to_content=time_to_desc),
            "transcript": TimeSeriesData(time_to_content=transcript),
        }
