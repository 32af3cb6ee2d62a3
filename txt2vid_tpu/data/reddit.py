"""Scraped reddit-videos captions converter (reference
data/reddit_videos_json_to_pickle.py): {url, title} JSON list -> {key: [title]}
pickle, with the url -> filesystem-key normalization shared with the cache scripts."""

import json
import pickle


def url_to_key(url: str) -> str:
    for ch in ":/?&=.%":
        url = url.replace(ch, "_")
    return url


def convert(json_path, out_path):
    with open(json_path) as f:
        entries = json.load(f)
    result = {}
    for e in entries:
        key = url_to_key(e["url"])
        result.setdefault(key, []).append(e["title"])
    with open(out_path, "wb") as f:
        pickle.dump(result, f)
    return result


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--json", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    print(f"{len(convert(a.json, a.out))} videos")
