"""Collect the r5 backbone comparison artifact (VERDICT item 3 TPU row):
CodebookOctreeGrid (VQAD) vs LatentGrid (SHACIRA), same scene/budget."""
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')


def main():
    rows = []
    for name, run in [('CodebookOctreeGrid (VQAD, ref nerf_codebook.yaml)',
                       'runs/cb_r5/cb_r5'),
                      ('LatentGrid (SHACIRA lego config, paged+lean)',
                       'runs/latent50_r5/latent50_r5')]:
        p = os.path.join(ROOT, run, 'metrics.json')
        if not os.path.exists(p):
            print(f'missing {p}')
            continue
        with open(p) as f:
            m = json.load(f)
        rows.append({'backbone': name,
                     'psnr': round(m['psnr'], 2),
                     'ssim': round(m.get('ssim', 0.0), 4),
                     'total_size_kb': round(m.get('total_size_kb', 0.0), 1),
                     'grid_size_kb': round(m.get(
                         'grid_size_kb', m.get('latent_size_kb', 0.0)), 1)})
    out = {'protocol': 'lego-class synthetic scene (/tmp/nerf_lego), mip 1 '
                       '(128x128), 50 epochs, same eval split — apples-to-'
                       'apples short-budget comparison like the reference\'s '
                       'grid_type sweeps (main_nerf.py:371-505)',
           'rows': rows}
    path = os.path.join(ROOT, 'artifacts', 'backbone_compare_r5.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
