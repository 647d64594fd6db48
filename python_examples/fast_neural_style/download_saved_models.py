"""Fetches the pretrained fast-neural-style checkpoints and converts
them to flax .msgpack (reference:
python_examples/fast_neural_style/download_saved_models.py:1-17, which
pulls the PyTorch example's saved_models.zip).

    python download_saved_models.py [--dest saved_models]

The download needs network access; on an air-gapped box, copy
saved_models.zip (or the four .pth files) into --dest yourself and
rerun — conversion is local (convert_torch_checkpoint.py).
"""
import argparse
import os
import subprocess
import sys
import zipfile

URL = ("https://www.dropbox.com/s/lrvwfehqdcxoza8/saved_models.zip?dl=1")
MODELS = ("candy", "mosaic", "rain_princess", "udnie")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", default="saved_models")
    args = parser.parse_args()
    os.makedirs(args.dest, exist_ok=True)

    zip_path = os.path.join(args.dest, "saved_models.zip")
    have_pth = all(
        os.path.exists(os.path.join(args.dest, f"{m}.pth")) for m in MODELS)
    if not have_pth:
        if not os.path.exists(zip_path):
            print(f"downloading {URL}")
            try:
                import urllib.request
                urllib.request.urlretrieve(URL, zip_path)
            except Exception as err:  # offline box: actionable message
                print(f"download failed ({err}).\n"
                      f"Copy saved_models.zip or the .pth files into "
                      f"{args.dest}/ manually and rerun.", file=sys.stderr)
                return 1
        with zipfile.ZipFile(zip_path) as z:
            for info in z.infolist():
                name = os.path.basename(info.filename)
                if name.endswith(".pth"):
                    with z.open(info) as src, open(
                            os.path.join(args.dest, name), "wb") as dst:
                        dst.write(src.read())

    here = os.path.dirname(os.path.abspath(__file__))
    for m in MODELS:
        pth = os.path.join(args.dest, f"{m}.pth")
        if not os.path.exists(pth):
            print(f"missing {pth}, skipping", file=sys.stderr)
            continue
        out = os.path.join(args.dest, f"{m}.msgpack")
        print(f"converting {pth} -> {out}")
        rc = subprocess.run(
            [sys.executable,
             os.path.join(here, "convert_torch_checkpoint.py"),
             pth, out]).returncode
        if rc != 0:
            return rc
    print("done; run: python neural_style.py -m "
          f"{args.dest}/mosaic.msgpack -i <stream> -o styled.mp4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
