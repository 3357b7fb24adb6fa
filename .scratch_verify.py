import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import math
import numpy as np, jax.numpy as jnp
from PIL import Image
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.lie import se3
from uwslam_tpu.utils.synthetic import render_plane_view

os.makedirs('/tmp/uws_ds/rgb', exist_ok=True)
cam = PinholeCamera(fx=120., fy=120., cx=79.5, cy=59.5, width=160, height=120)
rows = []
for i in range(20):
    tw = jnp.asarray([0.02*i, 0.008*i, 0.004*i, 0.002*i, -0.003*i, 0.001*i], jnp.float32) * 0.5
    T = se3.exp(tw)
    img = np.asarray(render_plane_view(cam, T, 2.0))
    Image.fromarray(img.astype(np.uint8)).save(f'/tmp/uws_ds/rgb/{i:06d}.png')
    Twc = np.asarray(se3.inverse(T))
    # quaternion from R
    R = Twc[:3,:3]; t = Twc[:3,3]
    qw = math.sqrt(max(0., 1+R[0,0]+R[1,1]+R[2,2]))/2
    qx = (R[2,1]-R[1,2])/(4*qw); qy=(R[0,2]-R[2,0])/(4*qw); qz=(R[1,0]-R[0,1])/(4*qw)
    rows.append(f'{i:06d} {t[0]} {t[1]} {t[2]} {qx} {qy} {qz} {qw}')
with open('/tmp/uws_ds/groundtruth.txt','w') as f:
    f.write('# gt\n# gt\n# gt\n' + '\n'.join(rows) + '\n')
with open('/tmp/uws_ds/calib.xml','w') as f:
    f.write('''<?xml version="1.0"?><opencv_storage>
<in_width>160</in_width><in_height>120</in_height>
<out_width>160</out_width><out_height>120</out_height>
<calibration_values type_id="opencv-matrix"><rows>1</rows><cols>4</cols><dt>f</dt><data>120.0 120.0 79.5 59.5</data></calibration_values>
<rectification type_id="opencv-matrix"><rows>1</rows><cols>4</cols><dt>f</dt><data>0 0 0 0</data></rectification>
</opencv_storage>''')
from uwslam_tpu.cli import main
main(['-d','/tmp/uws_ds/rgb','-c','/tmp/uws_ds/calib.xml',
      '--tum-gt','/tmp/uws_ds/groundtruth.txt',
      '--trajectory-out','/tmp/uws_ds/est.txt','--levels','4'])
