"""BSDF/volumetric differential tests vs an independent transcription.

Every lobe the corpus's materials2-5 rows exercise (refractive,
transparent, subsurface(=refractive), volumetric HG + transmittance) plus
the glossy/gltfpbr/reflective/matte rows, compared lane-by-lane against
scalar float64 transcriptions of the reference formulas
(pathtracer.wgsl: fresnel/microfacet :1443-1555, sampling :1789-1949,
eval :1951-2095, pdf :2097-2229, delta :2231-2404, volumetrics
:1895-1926/:2406-2422). These pin the physics the golden sweep cannot
resolve under sampling noise: a sign/branch flip in any term fails here
with zero Monte Carlo variance. Thresholds were calibrated against the
observed f32-vs-f64 error (max ~1.6e-4 on sampled directions, ~1e-6 on
closed-form terms); branch-boundary lanes (fresnel threshold, grazing
hemisphere) are explicitly filtered the way the reference's own f32
execution would flip them.
"""

import numpy as np



def test_refractive_transparent_delta_vs_reference():
    """Refractive/transparent eval+pdf, refractive delta sample/eval, HG inversion, transmittance pdf."""

    import jax
    import jax.numpy as jnp

    from lupinpathtracer_tpu.render import bsdf
    from lupinpathtracer_tpu.core import vec3 as v3
    from lupinpathtracer_tpu.core.vec3 import V3

    PI = np.pi
    rng = np.random.default_rng(0)
    N = 4000

    def rv(n=N):
        v = rng.normal(size=(n,3))
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    def tov3(a):
        return V3(jnp.asarray(a[:,0],jnp.float32), jnp.asarray(a[:,1],jnp.float32), jnp.asarray(a[:,2],jnp.float32))

    def fromv3(v):
        return np.stack([np.asarray(v.x,np.float64), np.asarray(v.y,np.float64), np.asarray(v.z,np.float64)],1)

    # ---- reference transcription (scalar, float64) ----
    def dot(a,b): return float(np.dot(a,b))
    def reflect_(w,n): return -w + 2*dot(n,w)*n
    def refract_(w,n,inv_eta):
        c = dot(n,w); k = 1 + inv_eta*inv_eta*(c*c-1)
        if k < 0: return np.zeros(3)
        return -w*inv_eta + (inv_eta*c - np.sqrt(k))*n
    def fresnel_dielectric(eta, n, o):
        cosw = abs(dot(n,o)); sin2 = 1-cosw*cosw; eta2=eta*eta
        cos2t = 1 - sin2/eta2
        if cos2t < 0: return 1.0
        t0=np.sqrt(cos2t); t1=eta*t0; t2=eta*cosw
        rs=(cosw-t1)/(cosw+t1); rp=(t0-t2)/(t0+t2)
        return (rs*rs+rp*rp)/2
    def microfacet_distribution(r, n, h):
        c = dot(n,h)
        if c <= 0: return 0.0
        r2=r*r; c2=c*c
        return r2/(PI*(c2*r2+1-c2)**2)
    def msh1(r,n,h,d):
        c=dot(n,d); ch=dot(h,d)
        if c*ch <= 0: return 0.0
        r2=r*r; c2=c*c
        return 2*abs(c)/(abs(c)+np.sqrt(c2-r2*c2+r2))
    def msh(r,n,h,o,i): return msh1(r,n,h,o)*msh1(r,n,h,i)

    def eval_refractive(ior, rough, n, o, i):
        entering = dot(n,o) >= 0
        up = n if entering else -n
        rel = ior if entering else 1.0/ior
        if dot(n,i)*dot(n,o) >= 0:
            h = (i+o)/np.linalg.norm(i+o)
            F = fresnel_dielectric(rel,h,o)
            D = microfacet_distribution(rough,up,h)
            G = msh(rough,up,h,o,i)
            return np.full(3, F*D*G/abs(4*dot(n,o)*dot(n,i))*abs(dot(n,i)))
        else:
            hv = rel*i+o
            h = -(hv/np.linalg.norm(hv)) * (1.0 if entering else -1.0)
            F = fresnel_dielectric(rel,h,o)
            D = microfacet_distribution(rough,up,h)
            G = msh(rough,up,h,o,i)
            return np.full(3, abs((dot(o,h)*dot(i,h))/(dot(o,n)*dot(i,n))) * (1-F)*D*G / (rel*dot(h,i)+dot(h,o))**2 * abs(dot(n,i)))

    def pdf_refractive(ior, rough, n, o, i):
        entering = dot(n,o) >= 0
        up = n if entering else -n
        rel = ior if entering else 1.0/ior
        def smp(h):
            c = dot(up,h)
            if c < 0: return 0.0
            return microfacet_distribution(rough,up,h)*c
        if dot(n,i)*dot(n,o) >= 0:
            h = (i+o)/np.linalg.norm(i+o)
            return fresnel_dielectric(rel,h,o)*smp(h)/(4*abs(dot(o,h)))
        else:
            hv = rel*i+o
            h = -(hv/np.linalg.norm(hv)) * (1.0 if entering else -1.0)
            return (1-fresnel_dielectric(rel,h,o))*smp(h)*abs(dot(h,i))/(rel*dot(h,i)+dot(h,o))**2

    def eval_transparent(color, ior, rough, n, o, i):
        up = n if dot(n,o) > 0 else -n
        if dot(n,o) == 0: up = -n
        if dot(n,i)*dot(n,o) >= 0:
            h=(i+o)/np.linalg.norm(i+o)
            F=fresnel_dielectric(ior,h,o); D=microfacet_distribution(rough,up,h); G=msh(rough,up,h,o,i)
            return np.full(3, F*D*G/(4*dot(up,o)*dot(up,i))*abs(dot(up,i)))
        else:
            refl = reflect_(-i, up)
            h=(refl+o)/np.linalg.norm(refl+o)
            F=fresnel_dielectric(ior,h,o); D=microfacet_distribution(rough,up,h); G=msh(rough,up,h,o,refl)
            return color*(1-F)*D*G/(4*dot(up,o)*dot(up,refl))*abs(dot(up,refl))

    def pdf_transparent(ior, rough, n, o, i):
        up = n if dot(n,o) > 0 else -n
        def smp(h):
            c=dot(up,h)
            if c<0: return 0.0
            return microfacet_distribution(rough,up,h)*c
        if dot(n,i)*dot(n,o) >= 0:
            h=(i+o)/np.linalg.norm(i+o)
            return fresnel_dielectric(ior,h,o)*smp(h)/(4*abs(dot(o,h)))
        else:
            refl=reflect_(-i,up)
            h=(refl+o)/np.linalg.norm(refl+o)
            return (1-fresnel_dielectric(ior,h,o))*smp(h)/(4*abs(dot(o,h)))

    def eval_delta_refr(ior, n, o, i):
        if abs(ior-1) < 1e-3:
            return np.full(3, 1.0 if dot(n,i)*dot(n,o) <= 0 else 0.0)
        entering = dot(n,o) >= 0
        up = n if entering else -n
        rel = ior if entering else 1.0/ior
        if dot(n,i)*dot(n,o) >= 0:
            return np.full(3, fresnel_dielectric(rel,up,o))
        return np.full(3, (1/(rel*rel))*(1-fresnel_dielectric(rel,up,o)))

    def sample_delta_refr(ior, n, o, rnl):
        if abs(ior-1) < 1e-3: return -o
        entering = dot(n,o) >= 0
        up = n if entering else -n
        rel = ior if entering else 1.0/ior
        if rnl < fresnel_dielectric(rel,up,o):
            return reflect_(o,up)
        return refract_(o,up,1.0/rel)

    def hg_sample_cos(g, ry):
        if abs(g) < 1e-3: return 1.0 - 2.0*ry
        sq = (1-g*g)/(1+g-2*g*ry)
        return (1+g*g-sq*sq)/(2*g)

    def tr_pdf(den, dist, maxd):
        if dist < maxd:
            return float(np.sum(den*np.exp(-den*dist)))/3.0
        return float(np.sum(np.exp(-den*maxd)))/3.0

    # ---------- run comparisons ----------
    class MP:
        pass

    normal = rv(); out = rv(); inc = rv()
    rough_np = rng.uniform(0.01, 1.0, N)**2
    ior_np = rng.uniform(1.01, 2.5, N)
    color_np = rng.uniform(0, 1, (N,3))

    mp = MP()
    mp.roughness = jnp.asarray(rough_np, jnp.float32)
    mp.ior = jnp.asarray(ior_np, jnp.float32)
    mp.color = tov3(color_np)
    mp.metallic = jnp.zeros(N, jnp.float32)

    nv = tov3(normal); ov = tov3(out); iv = tov3(inc)

    # eval_refractive
    got = fromv3(bsdf._eval_refractive(mp, nv, ov, iv))
    exp = np.stack([eval_refractive(ior_np[k], rough_np[k], normal[k], out[k], inc[k]) for k in range(N)])
    ok = np.isfinite(exp).all(1) & np.isfinite(got).all(1)
    rel = np.abs(got-exp)/(np.abs(exp)+1e-4)
    bad = ok & (rel.max(1) > 2e-2)
    print("eval_refractive mismatches:", bad.sum(), "of", ok.sum())
    if bad.sum():
        k = np.where(bad)[0][0]
        print("  sample k=",k, "got",got[k],"exp",exp[k], "n.o",dot(normal[k],out[k]),"n.i",dot(normal[k],inc[k]))

    # pdf_refractive
    gotp = np.asarray(bsdf._pdf_refractive(mp, nv, ov, iv), np.float64)
    expp = np.array([pdf_refractive(ior_np[k], rough_np[k], normal[k], out[k], inc[k]) for k in range(N)])
    okp = np.isfinite(expp) & np.isfinite(gotp)
    relp = np.abs(gotp-expp)/(np.abs(expp)+1e-4)
    badp = okp & (relp > 2e-2)
    print("pdf_refractive mismatches:", badp.sum(), "of", okp.sum())
    if badp.sum():
        k=np.where(badp)[0][0]; print("  k=",k,"got",gotp[k],"exp",expp[k])

    # eval_transparent
    gott = fromv3(bsdf._eval_transparent(mp, nv, ov, iv))
    expt = np.stack([eval_transparent(color_np[k], ior_np[k], rough_np[k], normal[k], out[k], inc[k]) for k in range(N)])
    okt = np.isfinite(expt).all(1) & np.isfinite(gott).all(1)
    relt = np.abs(gott-expt)/(np.abs(expt)+1e-4)
    badt = okt & (relt.max(1) > 2e-2)
    print("eval_transparent mismatches:", badt.sum(), "of", okt.sum())
    if badt.sum():
        k=np.where(badt)[0][0]; print("  k=",k,"got",gott[k],"exp",expt[k])

    # pdf_transparent
    gtp = np.asarray(bsdf._pdf_transparent(mp, nv, ov, iv), np.float64)
    etp = np.array([pdf_transparent(ior_np[k], rough_np[k], normal[k], out[k], inc[k]) for k in range(N)])
    oktp = np.isfinite(etp) & np.isfinite(gtp)
    reltp = np.abs(gtp-etp)/(np.abs(etp)+1e-4)
    badtp = oktp & (reltp > 2e-2)
    print("pdf_transparent mismatches:", badtp.sum(), "of", oktp.sum())
    if badtp.sum():
        k=np.where(badtp)[0][0]; print("  k=",k,"got",gtp[k],"exp",etp[k])

    # delta refr eval + sample (include some ior ~ 1)
    ior2_np = ior_np.copy(); ior2_np[:2000] = 1.0 + rng.uniform(-5e-4, 5e-4, 2000)
    mp2 = MP(); mp2.roughness = jnp.zeros(N, jnp.float32); mp2.ior = jnp.asarray(ior2_np, jnp.float32)
    mp2.color = tov3(color_np); mp2.metallic = jnp.zeros(N, jnp.float32)
    import lupinpathtracer_tpu.core.types as T
    mp2.mat_type = jnp.full(N, int(T.MaterialType.REFRACTIVE), jnp.int32)
    rnl_np = rng.uniform(0,1,N)
    gd = fromv3(bsdf.sample_delta(mp2, nv, ov, jnp.asarray(rnl_np, jnp.float32)))
    ed = np.stack([sample_delta_refr(ior2_np[k], normal[k], out[k], rnl_np[k]) for k in range(N)])
    # fresnel boundary lanes may flip branch in f32; allow either branch near boundary
    reld = np.abs(gd-ed).max(1)
    badd = reld > 1e-3
    # filter boundary cases
    bcount = 0
    for k in np.where(badd)[0]:
        entering = dot(normal[k], out[k]) >= 0
        up = normal[k] if entering else -normal[k]
        rel_ = ior2_np[k] if entering else 1/ior2_np[k]
        F = fresnel_dielectric(rel_, up, out[k])
        if abs(rnl_np[k]-F) > 1e-3 and abs(abs(ior2_np[k]-1)-1e-3) > 1e-4:
            bcount += 1
            if bcount < 3:
                print("  delta sample k=",k,"got",gd[k],"exp",ed[k],"rnl",rnl_np[k],"F",F,"ior",ior2_np[k])
    print("sample_delta(refr) mismatches:", bcount)

    ged = fromv3(bsdf.eval_delta(mp2, nv, ov, iv))
    eed = np.stack([eval_delta_refr(ior2_np[k], normal[k], out[k], inc[k]) for k in range(N)])
    relde = np.abs(ged-eed)/(np.abs(eed)+1e-4)
    badde = relde.max(1) > 2e-2
    bc=0
    for k in np.where(badde)[0]:
        if abs(abs(ior2_np[k]-1)-1e-3) > 1e-4 and abs(dot(normal[k],inc[k])*dot(normal[k],out[k])) > 1e-5:
            bc+=1
            if bc<3: print("  eval_delta k=",k,"got",ged[k],"exp",eed[k],"ior",ior2_np[k])
    print("eval_delta(refr) mismatches:", bc)

    # HG sampling cos_theta
    g_np = rng.uniform(-0.95, 0.95, N); ry_np = rng.uniform(0,1,N)
    ghg = np.asarray(bsdf._hg_cos_theta(jnp.asarray(g_np,jnp.float32), jnp.asarray(ry_np,jnp.float32)), np.float64)
    ehg = np.array([hg_sample_cos(g_np[k], ry_np[k]) for k in range(N)])
    print("hg_cos_theta max abs err:", np.abs(ghg-ehg).max())

    # transmittance pdf
    den_np = rng.uniform(0, 3, (N,3)); dist_np = rng.uniform(0,2,N); maxd_np = rng.uniform(0,2,N)
    gtr = np.asarray(bsdf.sample_transmittance_pdf(tov3(den_np), jnp.asarray(dist_np,jnp.float32), jnp.asarray(maxd_np,jnp.float32)), np.float64)
    etr = np.array([tr_pdf(den_np[k], dist_np[k], maxd_np[k]) for k in range(N)])
    print("transmittance_pdf max rel err:", (np.abs(gtr-etr)/(np.abs(etr)+1e-6)).max())

    assert bad.sum() == 0 and badp.sum() == 0
    assert badt.sum() == 0 and badtp.sum() == 0
    assert bcount == 0 and bc == 0
    assert np.abs(ghg - ehg).max() < 1e-3
    assert (np.abs(gtr - etr) / (np.abs(etr) + 1e-6)).max() < 1e-4



def test_sampling_directions_vs_reference():
    """Sampled directions (refractive/transparent/HG), conductor fresnel, scattering eval/pdf, distance sampling."""

    import jax
    import jax.numpy as jnp
    from lupinpathtracer_tpu.render import bsdf
    from lupinpathtracer_tpu.core.vec3 import V3

    PI = np.pi
    rng = np.random.default_rng(1)
    N = 4000

    def rv(n=N):
        v = rng.normal(size=(n,3))
        return v / np.linalg.norm(v, axis=1, keepdims=True)
    def tov3(a):
        return V3(jnp.asarray(a[:,0],jnp.float32), jnp.asarray(a[:,1],jnp.float32), jnp.asarray(a[:,2],jnp.float32))
    def fromv3(v):
        return np.stack([np.asarray(v.x,np.float64), np.asarray(v.y,np.float64), np.asarray(v.z,np.float64)],1)
    def dot(a,b): return float(np.dot(a,b))
    def nrm(a): return a/np.linalg.norm(a)
    def reflect_(w,n): return -w + 2*dot(n,w)*n
    def refract_(w,n,inv_eta):
        c = dot(n,w); k = 1 + inv_eta*inv_eta*(c*c-1)
        if k < 0: return np.zeros(3)
        return -w*inv_eta + (inv_eta*c - np.sqrt(k))*n
    def fresnel_dielectric(eta, n, o):
        cosw = abs(dot(n,o)); sin2 = 1-cosw*cosw; eta2=eta*eta
        cos2t = 1 - sin2/eta2
        if cos2t < 0: return 1.0
        t0=np.sqrt(cos2t); t1=eta*t0; t2=eta*cosw
        rs=(cosw-t1)/(cosw+t1); rp=(t0-t2)/(t0+t2)
        return (rs*rs+rp*rp)/2
    def basis_fromz(v):
        z = nrm(v)
        sign = -1.0 if z[2] < 0 else 1.0
        a = -1.0/(sign + z[2]); b = z[0]*z[1]*a
        x = np.array([1+sign*z[0]*z[0]*a, sign*b, -sign*z[0]])
        y = np.array([b, sign+z[1]*z[1]*a, -z[1]])
        return x,y,z
    def sample_microfacet(rough, n, rx, ry):
        phi = 2*PI*rx
        theta = np.arctan(rough*np.sqrt(ry/(1-ry))) if ry < 1 else PI/2
        lh = np.array([np.cos(phi)*np.sin(theta), np.sin(phi)*np.sin(theta), np.cos(theta)])
        x,y,z = basis_fromz(n)
        return nrm(x*lh[0]+y*lh[1]+z*lh[2])
    def same_hemi(n,o,i): return dot(n,o)*dot(n,i) >= 0
    def sample_hemisphere_cos(n, rx, ry):
        z = np.sqrt(ry); r = np.sqrt(max(1-z*z,0.0)); phi = 2*PI*rx
        bx,by,bz = basis_fromz(n)
        return nrm(bx*(r*np.cos(phi))+by*(r*np.sin(phi))+bz*z)

    def sample_refractive(ior, rough, n, o, rnl, rx, ry):
        entering = dot(n,o) >= 0
        up = n if entering else -n
        h = sample_microfacet(rough, up, rx, ry)
        if rnl < fresnel_dielectric(ior if entering else 1/ior, h, o):
            i = reflect_(o,h)
            return i if same_hemi(up,o,i) else np.zeros(3)
        i = refract_(o,h, 1/ior if entering else ior)
        return np.zeros(3) if same_hemi(up,o,i) else i

    def sample_transparent(ior, rough, n, o, rnl, rx, ry):
        up = n if dot(n,o) > 0 else -n
        h = sample_microfacet(rough, up, rx, ry)
        if rnl < fresnel_dielectric(ior, h, o):
            i = reflect_(o,h)
            return i if same_hemi(up,o,i) else np.zeros(3)
        refl = reflect_(o,h)
        i = -reflect_(refl, up)
        return np.zeros(3) if same_hemi(up,o,i) else i

    def fresnel_conductor(eta3, n, o):
        cosw = dot(n,o)
        if cosw <= 0: return np.zeros(3)
        cosw = min(max(cosw,-1),1)
        cos2 = cosw*cosw; sin2 = min(max(1-cos2,0),1)
        res = np.zeros(3)
        for c in range(3):
            e = eta3[c]; e2 = e*e
            t0 = e2 - sin2
            a2b2 = np.sqrt(t0*t0)
            t1 = a2b2 + cos2
            a = np.sqrt(max((a2b2+t0)/2,0))
            t2 = 2*a*cosw
            rs = (t1-t2)/(t1+t2)
            t3 = cos2*a2b2 + sin2*sin2
            t4 = t2*sin2
            rp = rs*(t3-t4)/(t3+t4)
            res[c] = (rp+rs)/2
        return res

    def hg_phase(g, c):
        d = 1+g*g-2*g*c
        return (1-g*g)/(4*PI*d*np.sqrt(d))

    class MP: pass
    normal = rv(); out = rv(); inc = rv()
    rough_np = rng.uniform(0.01, 1.0, N)**2
    ior_np = rng.uniform(1.05, 2.5, N)
    color_np = rng.uniform(0, 1, (N,3))
    rnl_np = rng.uniform(0,1,N); rx_np = rng.uniform(0,1,N); ry_np = rng.uniform(0,0.999,N)

    mp = MP()
    mp.roughness = jnp.asarray(rough_np, jnp.float32)
    mp.ior = jnp.asarray(ior_np, jnp.float32)
    mp.color = tov3(color_np)
    mp.metallic = jnp.asarray(rng.uniform(0,1,N), jnp.float32)
    nv=tov3(normal); ov=tov3(out)
    rnl=jnp.asarray(rnl_np,jnp.float32); rx=jnp.asarray(rx_np,jnp.float32); ry=jnp.asarray(ry_np,jnp.float32)

    def cmp_dir(name, got, exp, tol=2e-3, extra_skip=None):
        bad = 0
        for k in range(N):
            d = np.abs(got[k]-exp[k]).max()
            if d > tol:
                # skip branch-boundary lanes (f32 vs f64 fresnel/hemisphere flip)
                if extra_skip and extra_skip(k): continue
                bad += 1
                if bad <= 3: print(f"  {name} k={k} got={got[k]} exp={exp[k]}")
        print(name, "mismatches:", bad)
        return bad

    # sample_refractive
    got = fromv3(bsdf._sample_refractive(mp, nv, ov, rnl, rx, ry))
    exp = np.stack([sample_refractive(ior_np[k], rough_np[k], normal[k], out[k], rnl_np[k], rx_np[k], ry_np[k]) for k in range(N)])
    def skip_refr(k):
        entering = dot(normal[k],out[k]) >= 0
        up = normal[k] if entering else -normal[k]
        h = sample_microfacet(rough_np[k], up, rx_np[k], ry_np[k])
        F = fresnel_dielectric(ior_np[k] if entering else 1/ior_np[k], h, out[k])
        # boundary in rnl vs F, or the sampled dir nearly tangent
        if abs(rnl_np[k]-F) < 2e-3: return True
        i1 = reflect_(out[k],h); i2 = refract_(out[k],h, 1/ior_np[k] if entering else ior_np[k])
        if abs(dot(up,i1)*dot(up,out[k])) < 2e-3: return True
        if abs(dot(up,i2)*dot(up,out[k])) < 2e-3: return True
        c = dot(h,out[k]); k2 = 1 + (1/ior_np[k] if entering else ior_np[k])**2*(c*c-1)
        if abs(k2) < 2e-3: return True
        return False
    assert cmp_dir("sample_refractive", got, exp, extra_skip=skip_refr) == 0

    # sample_transparent
    gott = fromv3(bsdf._sample_transparent(mp, nv, ov, rnl, rx, ry))
    expt = np.stack([sample_transparent(ior_np[k], rough_np[k], normal[k], out[k], rnl_np[k], rx_np[k], ry_np[k]) for k in range(N)])
    def skip_tr(k):
        up = normal[k] if dot(normal[k],out[k]) > 0 else -normal[k]
        h = sample_microfacet(rough_np[k], up, rx_np[k], ry_np[k])
        F = fresnel_dielectric(ior_np[k], h, out[k])
        if abs(rnl_np[k]-F) < 2e-3: return True
        i1 = reflect_(out[k],h); i2 = -reflect_(reflect_(out[k],h), up)
        if abs(dot(up,i1)*dot(up,out[k])) < 2e-3: return True
        if abs(dot(up,i2)*dot(up,out[k])) < 2e-3: return True
        if abs(dot(normal[k],out[k])) < 2e-3: return True
        return False
    assert cmp_dir("sample_transparent", gott, expt, extra_skip=skip_tr) == 0

    # fresnel_conductor
    eta3_np = rng.uniform(1.0, 3.0, (N,3))
    gfc = fromv3(bsdf.fresnel_conductor(tov3(eta3_np), nv, ov))
    efc = np.stack([fresnel_conductor(eta3_np[k], normal[k], out[k]) for k in range(N)])
    err = np.abs(gfc-efc).max()
    print("fresnel_conductor max abs err:", err)

    # eval/sample scattering
    g_np = rng.uniform(-0.95,0.95,N)
    den_np = rng.uniform(0.01,3,(N,3)); sca_np = rng.uniform(0,1,(N,3))
    ges = fromv3(bsdf.eval_scattering(tov3(den_np), tov3(sca_np), jnp.asarray(g_np,jnp.float32), ov, tov3(inc)))
    ees = np.stack([sca_np[k]*den_np[k]*hg_phase(g_np[k], -dot(out[k],inc[k])) for k in range(N)])
    print("eval_scattering max rel err:", (np.abs(ges-ees)/(np.abs(ees)+1e-6)).max())
    gsp = np.asarray(bsdf.sample_scattering_pdf(tov3(den_np), jnp.asarray(g_np,jnp.float32), ov, tov3(inc)), np.float64)
    esp = np.array([hg_phase(g_np[k], -dot(out[k],inc[k])) for k in range(N)])
    print("sample_scattering_pdf max rel err:", (np.abs(gsp-esp)/(np.abs(esp)+1e-6)).max())

    # sample_scattering direction
    gss = fromv3(bsdf.sample_scattering(tov3(den_np), jnp.asarray(g_np,jnp.float32), ov, rx, ry))
    def samp_sc(g, o, rx_, ry_):
        if abs(g) < 1e-3: ct = 1-2*ry_
        else:
            sq = (1-g*g)/(1+g-2*g*ry_)
            ct = (1+g*g-sq*sq)/(2*g)
        st = np.sqrt(max(0,1-ct*ct)); phi = 2*PI*rx_
        bx,by,bz = basis_fromz(-o)
        return bx*(st*np.cos(phi))+by*(st*np.sin(phi))+bz*ct
    ess = np.stack([samp_sc(g_np[k], out[k], rx_np[k], ry_np[k]) for k in range(N)])
    print("sample_scattering max abs err:", np.abs(gss-ess).max())

    # sample_transmittance
    rl_np = rng.uniform(0,1,N); rdn = rng.uniform(0,0.999,N); maxd_np = rng.uniform(0.01,5,N)
    gst = np.asarray(bsdf.sample_transmittance(tov3(den_np), jnp.asarray(maxd_np,jnp.float32), jnp.asarray(rl_np,jnp.float32), jnp.asarray(rdn,jnp.float32)), np.float64)
    est = np.array([min(-np.log(1-rdn[k])/den_np[k][min(int(rl_np[k]*3),2)], maxd_np[k]) for k in range(N)])
    print("sample_transmittance max abs err:", np.abs(gst-est).max())

    assert err < 1e-4
    assert (np.abs(ges - ees) / (np.abs(ees) + 1e-6)).max() < 1e-3
    assert (np.abs(gsp - esp) / (np.abs(esp) + 1e-6)).max() < 1e-3
    assert np.abs(gss - ess).max() < 5e-3
    assert np.abs(gst - est).max() < 1e-3



def test_glossy_gltfpbr_reflective_matte_vs_reference():
    """Glossy/gltfpbr/reflective/matte eval+pdf and the roughness cleanup rules."""

    import jax
    import jax.numpy as jnp
    from lupinpathtracer_tpu.render import bsdf
    from lupinpathtracer_tpu.core.vec3 import V3

    PI = np.pi
    rng = np.random.default_rng(7)
    N = 4000
    def rv(n=N):
        v = rng.normal(size=(n,3)); return v/np.linalg.norm(v,axis=1,keepdims=True)
    def tov3(a): return V3(jnp.asarray(a[:,0],jnp.float32), jnp.asarray(a[:,1],jnp.float32), jnp.asarray(a[:,2],jnp.float32))
    def fromv3(v): return np.stack([np.asarray(v.x,np.float64),np.asarray(v.y,np.float64),np.asarray(v.z,np.float64)],1)
    def dot(a,b): return float(np.dot(a,b))
    def nrm(a): return a/np.linalg.norm(a)
    def fresnel_dielectric(eta,n,o):
        cosw=abs(dot(n,o)); sin2=1-cosw*cosw; c2t=1-sin2/(eta*eta)
        if c2t<0: return 1.0
        t0=np.sqrt(c2t); t1=eta*t0; t2=eta*cosw
        rs=(cosw-t1)/(cosw+t1); rp=(t0-t2)/(t0+t2)
        return (rs*rs+rp*rp)/2
    def mfd(r,n,h):
        c=dot(n,h)
        if c<=0: return 0.0
        r2=r*r; c2=c*c
        return r2/(PI*(c2*r2+1-c2)**2)
    def msh1(r,n,h,d):
        c=dot(n,d); ch=dot(h,d)
        if c*ch<=0: return 0.0
        r2=r*r; c2=c*c
        return 2*abs(c)/(abs(c)+np.sqrt(c2-r2*c2+r2))
    def msh(r,n,h,o,i): return msh1(r,n,h,o)*msh1(r,n,h,i)
    def e2r(eta): return ((eta-1)**2)/((eta+1)**2)
    def fschlick(col,n,o):
        if np.all(col==0): return np.zeros(3)
        c=dot(n,o)
        return col + (1-col)*np.clip(1-abs(c),0,1)**5
    def hcpdf(n,d):
        c=dot(n,d)
        return 0.0 if c<=0 else c/PI

    def eval_glossy(col,ior,r,n,o,i):
        if dot(n,i)*dot(n,o)<=0: return np.zeros(3)
        up=n if dot(n,o)>0 else -n
        F1=fresnel_dielectric(ior,up,o); h=nrm(i+o)
        F=fresnel_dielectric(ior,h,i); D=mfd(r,up,h); G=msh(r,up,h,o,i)
        return col*(1-F1)/PI*abs(dot(up,i)) + F*D*G/(4*dot(up,o)*dot(up,i))*abs(dot(up,i))
    def pdf_glossy(ior,r,n,o,i):
        if dot(n,i)*dot(n,o)<=0: return 0.0
        up=n if dot(n,o)>0 else -n
        h=nrm(o+i); F=fresnel_dielectric(ior,up,o)
        c=dot(up,h); smp=0.0 if c<0 else mfd(r,up,h)*c
        return F*smp/(4*abs(dot(o,h))) + (1-F)*hcpdf(up,i)
    def eval_gltf(col,ior,r,m,n,o,i):
        if dot(n,i)*dot(n,o)<=0: return np.zeros(3)
        refl = e2r(ior)*(1-m)+col*m
        up=n if dot(n,o)>0 else -n
        F1=fschlick(refl,up,o); h=nrm(i+o); F=fschlick(refl,h,i)
        D=mfd(r,up,h); G=msh(r,up,h,o,i)
        return col*(1-m)*(1-F1)/PI*abs(dot(up,i)) + F*D*G/(4*dot(up,o)*dot(up,i))*abs(dot(up,i))
    def pdf_gltf(col,ior,r,m,n,o,i):
        if dot(n,i)*dot(n,o)<=0: return 0.0
        up=n if dot(n,o)>0 else -n
        h=nrm(o+i); refl=e2r(ior)*(1-m)+col*m
        fs=fschlick(refl,up,o); F=float(np.mean(fs))
        c=dot(up,h); smp=0.0 if c<0 else mfd(r,up,h)*c
        return F*smp/(4*abs(dot(o,h))) + (1-F)*hcpdf(up,i)
    def eval_refl(col,r,n,o,i):
        if dot(n,i)*dot(n,o)<=0: return np.zeros(3)
        up=n if dot(n,o)>0 else -n
        h=nrm(i+o)
        eta = (1+np.sqrt(np.clip(col,0,0.99)))/(1-np.sqrt(np.clip(col,0,0.99)))
        cosw=dot(h,i)
        if cosw<=0: F=np.zeros(3)
        else:
            cosw=min(max(cosw,-1),1); cos2=cosw*cosw; sin2=min(max(1-cos2,0),1)
            F=np.zeros(3)
            for c_ in range(3):
                e=eta[c_]; t0=e*e-sin2; a2b2=abs(t0); t1=a2b2+cos2
                a=np.sqrt(max((a2b2+t0)/2,0)); t2=2*a*cosw
                rs=(t1-t2)/(t1+t2); t3=cos2*a2b2+sin2*sin2; t4=t2*sin2
                rp=rs*(t3-t4)/(t3+t4); F[c_]=(rp+rs)/2
        D=mfd(r,up,h); G=msh(r,up,h,o,i)
        return F*D*G/(4*dot(up,o)*dot(up,i))*abs(dot(up,i))

    class MP: pass
    normal=rv(); out=rv(); inc=rv()
    r_np=rng.uniform(0.03**2,1.0,N); ior_np=rng.uniform(1.05,2.5,N)
    col_np=rng.uniform(0,1,(N,3)); met_np=rng.uniform(0,1,N)
    mp=MP(); mp.roughness=jnp.asarray(r_np,jnp.float32); mp.ior=jnp.asarray(ior_np,jnp.float32)
    mp.color=tov3(col_np); mp.metallic=jnp.asarray(met_np,jnp.float32)
    nv,ov,iv=tov3(normal),tov3(out),tov3(inc)

    def chk(name, got, exp, tol=2e-2):
        if got.ndim==1: got=got[:,None]; exp=exp[:,None]
        ok=np.isfinite(exp).all(1)&np.isfinite(got).all(1)
        rel=(np.abs(got-exp)/(np.abs(exp)+1e-4)).max(1)
        bad=ok&(rel>tol)
        if bad.sum():
            k=np.where(bad)[0][0]; print("  k=",k,"got",got[k],"exp",exp[k])
        assert bad.sum() == 0, f"{name}: {bad.sum()} of {ok.sum()} lanes mismatch"

    chk("eval_glossy", fromv3(bsdf._eval_glossy(mp,nv,ov,iv)),
        np.stack([eval_glossy(col_np[k],ior_np[k],r_np[k],normal[k],out[k],inc[k]) for k in range(N)]))
    chk("pdf_glossy", np.asarray(bsdf._pdf_glossy(mp,nv,ov,iv),np.float64),
        np.array([pdf_glossy(ior_np[k],r_np[k],normal[k],out[k],inc[k]) for k in range(N)]))
    chk("eval_gltfpbr", fromv3(bsdf._eval_gltfpbr(mp,nv,ov,iv)),
        np.stack([eval_gltf(col_np[k],ior_np[k],r_np[k],met_np[k],normal[k],out[k],inc[k]) for k in range(N)]))
    chk("pdf_gltfpbr", np.asarray(bsdf._pdf_gltfpbr(mp,nv,ov,iv),np.float64),
        np.array([pdf_gltf(col_np[k],ior_np[k],r_np[k],met_np[k],normal[k],out[k],inc[k]) for k in range(N)]))
    chk("eval_reflective", fromv3(bsdf._eval_reflective(mp,nv,ov,iv)),
        np.stack([eval_refl(col_np[k],r_np[k],normal[k],out[k],inc[k]) for k in range(N)]))

    # matte
    def eval_matte(col,n,o,i):
        if dot(n,i)*dot(n,o)<=0: return np.zeros(3)
        return col/PI*abs(dot(n,i))
    chk("eval_matte", fromv3(bsdf._eval_matte(mp,nv,ov,iv)),
        np.stack([eval_matte(col_np[k],normal[k],out[k],inc[k]) for k in range(N)]))

    # roughness cleanup logic (materials.py inline replica check)
    from lupinpathtracer_tpu.core.types import MaterialType, MIN_ROUGHNESS
    mt_np = rng.integers(0,8,N)
    rough_in = rng.uniform(0,1.2,N)
    mt=jnp.asarray(mt_np,jnp.int32); ri=jnp.asarray(rough_in,jnp.float32)
    clamped=(mt==MaterialType.MATTE)|(mt==MaterialType.GLTFPBR)|(mt==MaterialType.GLOSSY)
    got_r=np.asarray(jnp.where(clamped, jnp.clip(ri,MIN_ROUGHNESS,1.0),
         jnp.where(mt==MaterialType.VOLUMETRIC,0.0,jnp.where(ri<MIN_ROUGHNESS,0.0,ri))),np.float64)
    def cleanup(t,r):
        if t in (0,7,1): return min(max(r,0.03*0.03),1.0)
        if t==6: return 0.0
        return 0.0 if r<0.03*0.03 else r
    exp_r=np.array([cleanup(mt_np[k],rough_in[k]) for k in range(N)])
    print("roughness cleanup max err:", np.abs(got_r-exp_r).max())
    assert np.abs(got_r - exp_r).max() < 1e-5
