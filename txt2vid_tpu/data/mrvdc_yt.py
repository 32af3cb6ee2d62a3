"""YouTube Data API category lookup (reference data/mrvdc/yt.py) — a dataset-curation
side tool that annotates MSRVDC clips with YouTube video categories.

Requires the google-api-python-client and OAuth credentials, plus network access;
none of which exist in an air-gapped TPU environment, so the dependency is gated and
the entry point degrades to a clear error. The lookup logic itself (batch the video
ids, query videos().list(part="snippet"), map categoryId) is preserved."""


def lookup_categories(video_ids, api_key=None, client_secrets=None):
    try:
        from googleapiclient.discovery import build  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "google-api-python-client is not available in this environment; "
            "run this curation tool on a networked machine") from e

    youtube = build("youtube", "v3", developerKey=api_key)
    categories = {}
    ids = list(video_ids)
    for i in range(0, len(ids), 50):
        chunk = ids[i:i + 50]
        resp = youtube.videos().list(part="snippet", id=",".join(chunk)).execute()
        for item in resp.get("items", []):
            categories[item["id"]] = item["snippet"].get("categoryId")
    return categories


if __name__ == "__main__":
    import argparse
    import pickle

    p = argparse.ArgumentParser()
    p.add_argument("--ids", required=True, help="text file of YouTube video ids")
    p.add_argument("--api_key", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    with open(a.ids) as f:
        ids = [line.strip() for line in f if line.strip()]
    cats = lookup_categories(ids, api_key=a.api_key)
    with open(a.out, "wb") as f:
        pickle.dump(cats, f)
    print(f"{len(cats)} categories")
