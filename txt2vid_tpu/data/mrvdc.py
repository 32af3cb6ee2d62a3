"""MSR Video Description Corpus ingest (reference data/mrvdc/read_data.py).

Parses MSR.csv, keeps English descriptions <= 60 chars for clips with >= MIN_FRAMES
frames (fps-probed via cv2 when available), keys clips `<VideoID>_<Start>_<End>`,
drops missing clips, and pickles {key: [sentences]}."""

import pickle
from pathlib import Path

MAX_DESC_LEN = 60
MIN_FRAMES = 32


def probe_num_frames(path) -> int | None:
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(str(path))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n if n > 0 else None


def read_csv(csv_path, video_dir=None, check_frames=True):
    import pandas as pd
    df = pd.read_csv(csv_path, encoding="utf-8", on_bad_lines="skip")
    df = df[df["Language"] == "English"]

    result = {}
    missing = 0
    for _, row in df.iterrows():
        desc = str(row["Description"]).strip()
        if len(desc) > MAX_DESC_LEN:
            continue
        key = f"{row['VideoID']}_{row['Start']}_{row['End']}"
        if video_dir is not None:
            candidates = list(Path(video_dir).glob(key + ".*"))
            if not candidates:
                missing += 1
                continue
            if check_frames:
                n = probe_num_frames(candidates[0])
                if n is not None and n < MIN_FRAMES:
                    continue
        result.setdefault(key, []).append(desc)
    if missing:
        print(f"missing {missing} clips")
    return result


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--videos", default=None)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    data = read_csv(a.csv, a.videos)
    print(f"{len(data)} clips")
    with open(a.out, "wb") as f:
        pickle.dump(data, f)
