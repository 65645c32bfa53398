"""Standalone browser replay: one self-contained .html file.

TPU-pod-friendly re-design of the reference's meshcat browser viewer
(`jiminy_py/viewer/meshcat/`, `replay.py play_trajectories`): instead of a ZMQ
server + websocket streaming (impossible on a headless pod), `export_html`
writes a single HTML file embedding the .glb replay (base64) plus a minimal
vanilla-JS WebGL glTF player — orbit camera, play/pause/scrub timeline, speed
control. Open it in any browser, no network, no dependencies.
"""

from __future__ import annotations

import base64
import os
from typing import Optional

_PLAYER_JS = r"""
'use strict';
// ---- minimal mat4/quat helpers (column-major, WebGL layout) ----
function m4ident(){return new Float32Array([1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]);}
function m4mul(a,b){const o=new Float32Array(16);
 for(let c=0;c<4;c++)for(let r=0;r<4;r++){let s=0;
  for(let k=0;k<4;k++)s+=a[k*4+r]*b[c*4+k]; o[c*4+r]=s;} return o;}
function m4persp(fovy,asp,near,far){const f=1/Math.tan(fovy/2),o=new Float32Array(16);
 o[0]=f/asp;o[5]=f;o[10]=(far+near)/(near-far);o[11]=-1;o[14]=2*far*near/(near-far);return o;}
function m4lookat(eye,ctr,up){
 let zx=eye[0]-ctr[0],zy=eye[1]-ctr[1],zz=eye[2]-ctr[2];
 let zl=Math.hypot(zx,zy,zz);zx/=zl;zy/=zl;zz/=zl;
 let xx=up[1]*zz-up[2]*zy,xy=up[2]*zx-up[0]*zz,xz=up[0]*zy-up[1]*zx;
 const xl=Math.hypot(xx,xy,xz);xx/=xl;xy/=xl;xz/=xl;
 const yx=zy*xz-zz*xy,yy=zz*xx-zx*xz,yz=zx*xy-zy*xx;
 return new Float32Array([xx,yx,zx,0, xy,yy,zy,0, xz,yz,zz,0,
  -(xx*eye[0]+xy*eye[1]+xz*eye[2]),-(yx*eye[0]+yy*eye[1]+yz*eye[2]),
  -(zx*eye[0]+zy*eye[1]+zz*eye[2]),1]);}
function m4trs(t,q,s){ // translation, quaternion xyzw, scale
 const x=q[0],y=q[1],z=q[2],w=q[3];
 const x2=x+x,y2=y+y,z2=z+z;
 const xx=x*x2,xy=x*y2,xz=x*z2,yy=y*y2,yz=y*z2,zz=z*z2,wx=w*x2,wy=w*y2,wz=w*z2;
 const sx=s?s[0]:1,sy=s?s[1]:1,sz=s?s[2]:1;
 return new Float32Array([
  (1-(yy+zz))*sx,(xy+wz)*sx,(xz-wy)*sx,0,
  (xy-wz)*sy,(1-(xx+zz))*sy,(yz+wx)*sy,0,
  (xz+wy)*sz,(yz-wx)*sz,(1-(xx+yy))*sz,0,
  t?t[0]:0,t?t[1]:0,t?t[2]:0,1]);}
function m4normal3(m){ // upper-3x3 (rigid + uniform scale assumption)
 return new Float32Array([m[0],m[1],m[2], m[4],m[5],m[6], m[8],m[9],m[10]]);}

// ---- GLB parsing ----
function parseGlb(buf){
 const dv=new DataView(buf);
 if(dv.getUint32(0,true)!==0x46546C67)throw new Error('not a GLB');
 const len=dv.getUint32(8,true);let off=12,json=null,bin=null;
 while(off<len){const clen=dv.getUint32(off,true),ctype=dv.getUint32(off+4,true);
  const chunk=buf.slice(off+8,off+8+clen);
  if(ctype===0x4E4F534A)json=JSON.parse(new TextDecoder().decode(chunk));
  else if(ctype===0x004E4942)bin=chunk;
  off+=8+clen;}
 return {json:json,bin:bin};}
function accessorArray(g,bin,idx){
 const acc=g.accessors[idx],bv=g.bufferViews[acc.bufferView];
 const off=(bv.byteOffset||0)+(acc.byteOffset||0);
 const ncomp={SCALAR:1,VEC2:2,VEC3:3,VEC4:4,MAT4:16}[acc.type];
 const n=acc.count*ncomp;
 switch(acc.componentType){
  case 5126:return new Float32Array(bin,off,n);
  case 5123:return new Uint16Array(bin,off,n);
  case 5125:return new Uint32Array(bin,off,n);
  case 5121:return new Uint8Array(bin,off,n);
  default:throw new Error('componentType '+acc.componentType);}}

// ---- renderer ----
const VS=`attribute vec3 aPos;attribute vec3 aNrm;
uniform mat4 uMVP;uniform mat4 uModel;uniform mat3 uNrm;
varying vec3 vN;varying vec3 vP;
void main(){gl_Position=uMVP*vec4(aPos,1.0);
 vN=normalize(uNrm*aNrm);vP=(uModel*vec4(aPos,1.0)).xyz;}`;
const FS=`precision mediump float;
varying vec3 vN;varying vec3 vP;
uniform vec4 uColor;uniform vec3 uEye;
void main(){
 vec3 n=normalize(vN);vec3 l1=normalize(vec3(0.4,0.3,1.0));
 vec3 v=normalize(uEye-vP);if(dot(n,v)<0.0)n=-n;
 float d=max(dot(n,l1),0.0)*0.65+0.35;
 float sp=pow(max(dot(normalize(l1+v),n),0.0),24.0)*0.25;
 gl_FragColor=vec4(uColor.rgb*d+vec3(sp),uColor.a);}`;

function b64buf(b64){
 const raw=atob(b64);const buf=new ArrayBuffer(raw.length);
 const u8=new Uint8Array(buf);for(let i=0;i<raw.length;i++)u8[i]=raw.charCodeAt(i);
 return buf;}

function start(glbB64){
 const canvas=document.getElementById('view');
 const gl=canvas.getContext('webgl',{antialias:true});
 if(!gl){document.body.innerHTML='WebGL unavailable';return;}
 function sh(type,src){const s=gl.createShader(type);gl.shaderSource(s,src);
  gl.compileShader(s);if(!gl.getShaderParameter(s,gl.COMPILE_STATUS))
   throw new Error(gl.getShaderInfoLog(s));return s;}
 const prog=gl.createProgram();
 gl.attachShader(prog,sh(gl.VERTEX_SHADER,VS));
 gl.attachShader(prog,sh(gl.FRAGMENT_SHADER,FS));
 gl.linkProgram(prog);gl.useProgram(prog);
 const loc={aPos:gl.getAttribLocation(prog,'aPos'),aNrm:gl.getAttribLocation(prog,'aNrm'),
  uMVP:gl.getUniformLocation(prog,'uMVP'),uModel:gl.getUniformLocation(prog,'uModel'),
  uNrm:gl.getUniformLocation(prog,'uNrm'),uColor:gl.getUniformLocation(prog,'uColor'),
  uEye:gl.getUniformLocation(prog,'uEye')};

 // Scene state — replaced wholesale by loadBuffer() so the live mode can
 // hot-swap the replay while GL context, camera, and UI survive.
 let meshes=[],nodes=[],roots=[],channels=[],tMax=0,t0=0;
 let framed=false;

 function loadBuffer(buf,follow){
  const glb=parseGlb(buf),g=glb.json,bin=glb.bin;
  meshes.forEach(function(mesh){mesh.forEach(function(pm){
   gl.deleteBuffer(pm.vboP);gl.deleteBuffer(pm.vboN);gl.deleteBuffer(pm.ibo);});});

  // Upload meshes
  meshes=(g.meshes||[]).map(function(mesh){
   return mesh.primitives.map(function(prim){
    const pos=accessorArray(g,bin,prim.attributes.POSITION);
    const nrm=prim.attributes.NORMAL!==undefined?
      accessorArray(g,bin,prim.attributes.NORMAL):new Float32Array(pos.length);
    const idx=accessorArray(g,bin,prim.indices);
    const vboP=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,vboP);
    gl.bufferData(gl.ARRAY_BUFFER,pos,gl.STATIC_DRAW);
    const vboN=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,vboN);
    gl.bufferData(gl.ARRAY_BUFFER,nrm,gl.STATIC_DRAW);
    const ibo=gl.createBuffer();gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER,ibo);
    const idx32=idx instanceof Uint32Array?idx:new Uint32Array(idx);
    let type=gl.UNSIGNED_SHORT,idata=idx;
    if(idx instanceof Uint32Array){
      if(gl.getExtension('OES_element_index_uint'))type=gl.UNSIGNED_INT;
      else {idata=new Uint16Array(idx32);type=gl.UNSIGNED_SHORT;}}
    gl.bufferData(gl.ELEMENT_ARRAY_BUFFER,idata,gl.STATIC_DRAW);
    let color=[0.6,0.6,0.7,1];
    if(prim.material!==undefined){
      const m=g.materials[prim.material];
      if(m.pbrMetallicRoughness&&m.pbrMetallicRoughness.baseColorFactor)
        color=m.pbrMetallicRoughness.baseColorFactor;}
    return {vboP:vboP,vboN:vboN,ibo:ibo,n:idx.length,type:type,color:color};});});

  // Nodes + hierarchy
  nodes=(g.nodes||[]).map(function(nd){return {
   t:(nd.translation||[0,0,0]).slice(),
   q:(nd.rotation||[0,0,0,1]).slice(),
   s:(nd.scale||[1,1,1]).slice(),
   mesh:nd.mesh,children:nd.children||[],world:m4ident()};});
  const isChild=new Set();nodes.forEach(function(nd){
   nd.children.forEach(function(c){isChild.add(c);});});
  roots=[];for(let i=0;i<nodes.length;i++)if(!isChild.has(i))roots.push(i);

  // Animation channels
  tMax=0;channels=[];
  (g.animations||[]).forEach(function(anim){
   anim.channels.forEach(function(ch){
    const smp=anim.samplers[ch.sampler];
    const tin=accessorArray(g,bin,smp.input);
    const out=accessorArray(g,bin,smp.output);
    tMax=Math.max(tMax,tin[tin.length-1]);
    channels.push({node:ch.target.node,path:ch.target.path,tin:tin,out:out});});});
  t0=channels.length?channels[0].tin[0]:0;

  if(!framed){frameCamera();framed=true;}
  if(slider){slider.max=Math.max(tMax-t0,0.0001);}
  if(follow){tCur=tMax;playing=true;if(btn)btn.textContent='❚❚';}
  else if(tCur<t0||tCur>tMax){tCur=t0;}
 }
 window.__loadGlb=function(b64OrBuf,follow){
  loadBuffer(typeof b64OrBuf==='string'?b64buf(b64OrBuf):b64OrBuf,follow);};
 window.__timeline=function(){return {t:tCur,tMax:tMax,t0:t0};};

 function sample(ch,t){
  const tin=ch.tin;let lo=0,hi=tin.length-1;
  if(t<=tin[0])lo=hi=0;else if(t>=tin[hi])lo=hi;
  else{while(hi-lo>1){const m=(lo+hi)>>1;if(tin[m]<=t)lo=m;else hi=m;}}
  const k=ch.path==='rotation'?4:3;
  const a=ch.out.subarray(lo*k,lo*k+k),b=ch.out.subarray(hi*k,hi*k+k);
  const u=hi>lo?(t-tin[lo])/(tin[hi]-tin[lo]):0;
  const o=new Array(k);
  if(ch.path==='rotation'){
   let dot=0;for(let i=0;i<4;i++)dot+=a[i]*b[i];
   const sgn=dot<0?-1:1;let nn=0;
   for(let i=0;i<4;i++){o[i]=a[i]*(1-u)+sgn*b[i]*u;nn+=o[i]*o[i];}
   nn=Math.sqrt(nn)||1;for(let i=0;i<4;i++)o[i]/=nn;
  } else for(let i=0;i<k;i++)o[i]=a[i]*(1-u)+b[i]*u;
  return o;}

 // Orbit camera state (Z-up, matching the simulator's world frame)
 let span=1,ctr=[0,0,0.3];
 let az=0.9,el=0.35,dist=span*2.6,pan=[ctr[0],ctr[1],ctr[2]];
 function frameCamera(){
  // Scene bounds for camera framing (node translations + mesh extents)
  let mn=[1e9,1e9,1e9],mx=[-1e9,-1e9,-1e9],any=false;
  nodes.forEach(function(nd){if(nd.mesh===undefined)return;any=true;
   for(let i=0;i<3;i++){mn[i]=Math.min(mn[i],nd.t[i]);mx[i]=Math.max(mx[i],nd.t[i]);}});
  if(any){ctr=[(mn[0]+mx[0])/2,(mn[1]+mx[1])/2,(mn[2]+mx[2])/2];
   span=Math.max(mx[0]-mn[0],mx[1]-mn[1],mx[2]-mn[2],0.6);}
  dist=span*2.6;pan=[ctr[0],ctr[1],ctr[2]];}
 canvas.addEventListener('contextmenu',function(e){e.preventDefault();});
 let drag=null;
 canvas.addEventListener('mousedown',function(e){drag={x:e.clientX,y:e.clientY,b:e.button,shift:e.shiftKey};});
 window.addEventListener('mouseup',function(){drag=null;});
 window.addEventListener('mousemove',function(e){
  if(!drag)return;const dx=e.clientX-drag.x,dy=e.clientY-drag.y;
  drag.x=e.clientX;drag.y=e.clientY;
  if(drag.b===2||drag.shift){
   const s=dist*0.0015;
   const cx=Math.cos(az),sx=Math.sin(az);
   pan[0]+=(-dx*-sx)*s-(-dy)*cx*Math.sin(el)*s;
   pan[1]+=(-dx*cx)*s-(-dy)*sx*Math.sin(el)*s;
   pan[2]+=dy*Math.cos(el)*s;
  } else {az-=dx*0.008;el=Math.min(1.5,Math.max(-1.5,el+dy*0.008));}});
 canvas.addEventListener('wheel',function(e){e.preventDefault();
  dist*=Math.exp(e.deltaY*0.001);dist=Math.max(span*0.2,Math.min(span*40,dist));},
  {passive:false});

 // Timeline UI
 const slider=document.getElementById('time'),btn=document.getElementById('play'),
  lbl=document.getElementById('tlabel'),speedSel=document.getElementById('speed');
 let playing=true,tCur=0,last=null;
 btn.onclick=function(){playing=!playing;btn.textContent=playing?'❚❚':'▶';last=null;};
 slider.oninput=function(){tCur=t0+parseFloat(slider.value);playing=false;
  btn.textContent='▶';};

 loadBuffer(b64buf(glbB64),false);
 playing=tMax>t0;tCur=t0;
 btn.textContent=playing?'❚❚':'▶';

 function draw(now){
  requestAnimationFrame(draw);
  if(playing&&tMax>t0){
   if(last!==null)tCur+=(now-last)/1000*parseFloat(speedSel.value);
   last=now;
   if(tCur>tMax){if(window.__liveFollow)tCur=tMax;
    else tCur=t0+(tCur-t0)%(tMax-t0);}
  } else last=now;
  slider.value=(tCur-t0).toFixed(4);
  lbl.textContent=tCur.toFixed(2)+' / '+tMax.toFixed(2)+' s';

  channels.forEach(function(ch){
   const v=sample(ch,tCur);
   if(ch.path==='translation')nodes[ch.node].t=v;
   else if(ch.path==='rotation')nodes[ch.node].q=v;
   else if(ch.path==='scale')nodes[ch.node].s=v;});
  // world transforms
  function rec(i,parent){
   const nd=nodes[i];
   nd.world=m4mul(parent,m4trs(nd.t,nd.q,nd.s));
   nd.children.forEach(function(c){rec(c,nd.world);});}
  roots.forEach(function(r){rec(r,m4ident());});

  const w=canvas.clientWidth,h=canvas.clientHeight;
  if(canvas.width!==w||canvas.height!==h){canvas.width=w;canvas.height=h;}
  gl.viewport(0,0,w,h);
  gl.enable(gl.DEPTH_TEST);
  gl.clearColor(0.93,0.94,0.96,1);
  gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
  const eye=[pan[0]+dist*Math.cos(el)*Math.cos(az),
             pan[1]+dist*Math.cos(el)*Math.sin(az),
             pan[2]+dist*Math.sin(el)];
  const view=m4lookat(eye,pan,[0,0,1]);
  const proj=m4persp(0.9,w/h,0.01*span,100*span);
  const vp=m4mul(proj,view);
  gl.uniform3fv(loc.uEye,eye);
  nodes.forEach(function(nd){
   if(nd.mesh===undefined)return;
   const mvp=m4mul(vp,nd.world);
   gl.uniformMatrix4fv(loc.uMVP,false,mvp);
   gl.uniformMatrix4fv(loc.uModel,false,nd.world);
   gl.uniformMatrix3fv(loc.uNrm,false,m4normal3(nd.world));
   meshes[nd.mesh].forEach(function(pm){
    gl.uniform4fv(loc.uColor,pm.color);
    gl.bindBuffer(gl.ARRAY_BUFFER,pm.vboP);
    gl.enableVertexAttribArray(loc.aPos);
    gl.vertexAttribPointer(loc.aPos,3,gl.FLOAT,false,0,0);
    gl.bindBuffer(gl.ARRAY_BUFFER,pm.vboN);
    gl.enableVertexAttribArray(loc.aNrm);
    gl.vertexAttribPointer(loc.aNrm,3,gl.FLOAT,false,0,0);
    gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER,pm.ibo);
    gl.drawElements(gl.TRIANGLES,pm.n,pm.type,0);});});
 }
 requestAnimationFrame(draw);
}
"""

_HTML_TMPL = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 html,body{{margin:0;height:100%;overflow:hidden;
  font:13px system-ui,-apple-system,sans-serif}}
 #view{{width:100%;height:calc(100% - 44px);display:block;cursor:grab}}
 #bar{{height:44px;display:flex;align-items:center;gap:10px;padding:0 12px;
  background:#1d2430;color:#dfe5ee;box-sizing:border-box}}
 #play{{width:36px;height:28px;border:none;border-radius:4px;background:#3a7afe;
  color:#fff;font-size:13px;cursor:pointer}}
 #time{{flex:1}}
 select{{background:#2a3342;color:#dfe5ee;border:1px solid #3a465c;
  border-radius:4px;padding:2px 4px}}
 #tlabel{{min-width:110px;text-align:right;font-variant-numeric:tabular-nums}}
</style></head>
<body>
<canvas id="view"></canvas>
<div id="bar">
 <button id="play">▶</button>
 <input id="time" type="range" min="0" max="1" step="0.001" value="0">
 <select id="speed">
  <option value="0.25">0.25×</option><option value="0.5">0.5×</option>
  <option value="1" selected>1×</option><option value="2">2×</option>
 </select>
 <span id="tlabel"></span>
</div>
<script>{player_js}</script>
<script>start("{glb_b64}");</script>
</body></html>
"""


def export_html(
    trajectory=None,
    path: str = "replay.html",
    robot=None,
    glb: Optional[bytes] = None,
    title: str = "jiminy_tpu replay",
    **gltf_kwargs,
) -> str:
    """Write a single self-contained HTML replay file.

    Either pass a `Trajectory` (exported via `export_gltf` internally, with
    `gltf_kwargs` forwarded: fps/ground_fn/colors/...) or raw `glb` bytes /
    a path to an existing .glb. Returns `path`.
    """
    if glb is None:
        if isinstance(trajectory, (str, os.PathLike)):
            with open(trajectory, "rb") as f:
                glb = f.read()
        else:
            if trajectory is None:
                raise ValueError("export_html needs a trajectory or glb bytes")
            import tempfile

            from jiminy_tpu.viewer.gltf import export_gltf

            with tempfile.TemporaryDirectory() as d:
                p = os.path.join(d, "replay.glb")
                export_gltf(trajectory, p, robot=robot, **gltf_kwargs)
                with open(p, "rb") as f:
                    glb = f.read()
    html = _HTML_TMPL.format(
        title=title,
        player_js=_PLAYER_JS,
        glb_b64=base64.b64encode(glb).decode("ascii"),
    )
    with open(path, "w") as f:
        f.write(html)
    return path
