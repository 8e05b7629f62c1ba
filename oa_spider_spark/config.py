"""Engine constants.

The image-kernel constants reproduce the reference's captcha pipeline
(`/root/reference/oa_spider/captcha/captcha.py:11-15`): binary images use
BLACK=0 / WHITE=255 and the manually-tuned binarization threshold 135.

Timeout/retry constants mirror the reference's network discipline
(`/root/reference/oa_spider/oa.py:22,178`, `run.py:14-41`) but are expressed
as engine config, not wall-clock sleeps.
"""

BLACK = 0
WHITE = 255
THRESHOLD = 135  # captcha.py:15 — manually calibrated binarization threshold

# Retry taxonomy (reference run.py:14-41): retryable errors re-enter the
# frontier with attempt+1 up to MAX_ATTEMPTS, then land in the dead-letter
# partition (status='failed').
MAX_ATTEMPTS = 3

# Timeout discipline (T3; reference oa.py:22 `requests(..., timeout=)` —
# ReadTimeout is retryable, run.py:23-27). Every synthetic fetch carries a
# deterministic simulated service time; past this budget the fetch is
# abandoned at the deadline (no payload, status='retry', reason='timeout')
# and rides the same attempt+1 / dead-letter machinery. Expressed as data,
# not wall-clock sleeps — the engine never blocks on it.
FETCH_TIMEOUT_MS = 400

# Fake-lossy codec quantization step; q=4 keeps max per-pixel error at 2,
# i.e. PSNR >= 42 dB — above the BASELINE.json 40 dB invariant.
LOSSY_QUANT = 4

# Politeness: default per-host fetch budget per round (replaces the
# reference's cron cadence, README_OLD.md:36-42).
DEFAULT_HOST_BUDGET = 100

# Nominal wall-clock span one round represents (reference cadence:
# 3 rounds/hour). A host's `crawl_delay_ms` (its robots Crawl-delay)
# caps its effective budget at ROUND_PERIOD_MS / crawl_delay_ms — the
# declarative analog of the reference sleeping between requests.
ROUND_PERIOD_MS = 20 * 60 * 1000

# Hot-host skew defusal at the fetch repartition (SURVEY.md §4 item 1)
# salts by the partition count (politeness.salted_repartition) so a hot
# host spreads across every fetch task; no fixed salt constant.
